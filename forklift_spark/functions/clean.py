"""Value-cleaning functions (U5 parity).

The reference retries failed inserts after replacing characters whose
codepoint exceeds ``char_bytecode_max`` (default 65535) with ``'???'``
(`transports/mysql.rb:86-99`, `plan.rb:149`) — a workaround for MySQL
``utf8``'s 3-byte ceiling. Spark strings are full UTF-8 so no retry
path exists; the cleaner is exposed as an explicit projection for
pipelines that feed legacy stores. One regexp per column, JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CHAR_MAX_DEFAULT = 65535  # plan.rb:149


def sanitize_overflow_chars(
    col: Column | str, char_max: int = CHAR_MAX_DEFAULT, replacement: str = "???"
) -> Column:
    """Replace every char with codepoint > char_max by ``replacement``
    (the reference replaces per offending char, `mysql.rb:93-96`)."""
    c = F.col(col) if isinstance(col, str) else col
    # chars strictly above the ceiling; 65535 -> the non-BMP astral set
    pattern = f"[^\\x{{0}}-\\x{{{char_max:x}}}]"
    return F.regexp_replace(c, pattern, replacement)
