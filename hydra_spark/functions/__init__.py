"""Scalar column-expression library (SURVEY.md §2.8).

Everything here is a pure Catalyst expression — JVM-side, codegen'd,
no Python in the hot path.
"""

from hydra_spark.functions.urls import (  # noqa: F401
    canonicalize_url,
    excluded_clause,
    url_domain,
    url_hash64,
    url_hash32,
    host_bucket,
)
from hydra_spark.functions.headers import (  # noqa: F401
    normalize_headers,
    content_type_base,
    header,
)
