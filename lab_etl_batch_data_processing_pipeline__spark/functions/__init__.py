from .json_funcs import json_get, json_get_int  # noqa: F401
from .text_funcs import (  # noqa: F401
    normalized_text,
    punct_count,
    stopword_count,
    token_count,
    tokens,
)
from .vector_funcs import cosine_similarity, dot_product, l2_norm  # noqa: F401
