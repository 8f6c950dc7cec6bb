"""Large-scale data-pipeline operators: dedup, similarity, text, multimodal."""
