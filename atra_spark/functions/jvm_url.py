"""JVM-side (whole-stage-codegen) column implementations of the hot
URL functions — no Python worker in the per-link path.

``origin_col`` mirrors :func:`atra_spark.urlkit.origin` exactly
(pytest-verified equivalence) and is used in the link-expansion hot
path where a pandas UDF would put millions of rows per round through
Python. The pandas UDFs in functions/url_udfs.py remain the reference
implementations and handle the odd cases (seeding, ad-hoc input).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..urlkit import _MULTI_LABEL_SUFFIXES

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/@?#]*@)?([^:/?#]+)"
_SCHEME_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*"


def host_col(url: Column) -> Column:
    """Lowercased hostname of an absolute URL (NULL if no match)."""
    h = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    return F.when(h == "", F.lit(None).cast("string")).otherwise(h)


def origin_col(url: Column) -> Column:
    """Registrable-domain politeness key (urlkit.origin, JVM-side).

    IPs and <=2-label hosts pass through; known multi-label suffixes
    keep 3 labels; everything else keeps 2 (atra/src/url/origin.rs:23-49
    semantics with the embedded PSL subset).
    """
    host = host_col(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, n - 1, 2))
    last3 = F.concat_ws(".", F.slice(labels, n - 2, 3))
    is_ip = host.rlike(r"^[0-9.]+$") | host.contains(":")
    return (
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when(is_ip | (n <= 2), host)
        .when(last2.isin(*sorted(_MULTI_LABEL_SUFFIXES)), last3)
        .otherwise(last2)
    )


def path_col(url: Column) -> Column:
    """URL path+query (leading '/'; '/' when empty)."""
    p = F.regexp_replace(url, _SCHEME_AUTH_RE, "")
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_allowed_col(url: Column, disallow: Column) -> Column:
    """True unless the URL path starts with any disallow prefix —
    higher-order ``exists`` over the per-host prefix array, fully
    JVM-side (replaces a pandas-UDF prefix check in the admission hot
    path)."""
    p = path_col(url)
    dis = F.coalesce(disallow, F.array().cast("array<string>"))
    return ~F.exists(dis, lambda pref: p.startswith(pref))
