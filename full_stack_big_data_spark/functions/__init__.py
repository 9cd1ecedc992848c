from .text import tokens, tokens_sql, STOPWORDS_EN
from .hashing import hex64, hex64_sql, md5_concat, md5_concat_sql
from .vectors import cosine_sim, dot, l2_norm

__all__ = [
    "tokens", "tokens_sql", "STOPWORDS_EN",
    "hex64", "hex64_sql", "md5_concat", "md5_concat_sql",
    "cosine_sim", "dot", "l2_norm",
]
