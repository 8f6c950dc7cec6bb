"""``python -m forklift_spark`` — CLI dispatch (see cli.py)."""

import sys

from forklift_spark.cli import main

sys.exit(main())
