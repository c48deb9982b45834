from wiki_mysql_spark.functions.cleaning import (
    REDIRECT_PATTERN,
    clean_wiki_body,
    collapse_whitespace,
    decode_html_entities,
    decode_html_entities_udf,
    extract_redirect_target,
    strip_wiki_markup,
    unicode_blacklist,
    unicode_whitelist,
)

__all__ = [
    "REDIRECT_PATTERN",
    "clean_wiki_body",
    "collapse_whitespace",
    "decode_html_entities",
    "decode_html_entities_udf",
    "extract_redirect_target",
    "strip_wiki_markup",
    "unicode_blacklist",
    "unicode_whitelist",
]
