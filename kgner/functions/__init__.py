from kgner.functions.text import (  # noqa: F401
    extract_text_udf,
    split_sentences_udf,
    with_sentences,
    with_tokens,
)
