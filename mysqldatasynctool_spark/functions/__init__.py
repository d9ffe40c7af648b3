from .text import (
    tokens_col,
    shingles_col,
    normalized_text_col,
    minhash_cols,
    band_cols,
)

__all__ = [
    "tokens_col",
    "shingles_col",
    "normalized_text_col",
    "minhash_cols",
    "band_cols",
]
