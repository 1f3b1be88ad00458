"""S9/S11/S12: object-store access — the reference's custom-endpoint AWS
config + upload helpers (reference src/aws.jl:7-103, src/utils.jl:3-88)
re-expressed as Hadoop s3a configuration on the SparkSession.

The reference builds a ``CustomAWSConfig`` from an INI profile with a
non-AWS endpoint (src/aws.jl:21-64) and streams objects itself. On Spark
the executor-side S3 client IS the s3a connector, so "the S3 source" is
configuration, not code: set endpoint/credentials/path-style once and every
``spark.read.parquet("s3a://...")`` scan and ``df.write`` sink uses it —
including the multipart committer that replaces the reference's per-object
``upload_zarr_to_s3`` walk (src/utils.jl:3-42).

No live object store exists in this sandbox; tests assert the conf wiring
and content-type inference table (src/utils.jl:24-29) only.
"""

from __future__ import annotations

import configparser
import os

from pyspark.sql import SparkSession

# content-type inference (reference src/utils.jl:24-29, 48-61)
CONTENT_TYPES = {
    ".json": "application/json",
    ".zarray": "application/json",
    ".zattrs": "application/json",
    ".zgroup": "application/json",
    ".zmetadata": "application/json",
    ".html": "text/html",
    ".txt": "text/plain",
    ".parquet": "application/octet-stream",
    ".xml": "application/xml",
}


def content_type_for(path: str) -> str:
    """Infer upload content type from extension; octet-stream fallback.

    Zarr metadata files are bare dotfiles (``.zattrs``, ``.zarray``, …) so
    the basename itself is consulted when splitext sees no extension —
    mirrors the reference's endswith checks (src/utils.jl:24-29).
    """
    base = os.path.basename(path)
    _, ext = os.path.splitext(base)
    key = (ext or base).lower()
    return CONTENT_TYPES.get(key, "application/octet-stream")


def load_profile(ini_path: str, profile: str = "default") -> dict[str, str]:
    """INI profile lookup (reference src/aws.jl:21-32 get_config)."""
    cp = configparser.ConfigParser()
    if not cp.read(ini_path):
        raise FileNotFoundError(ini_path)
    if profile not in cp:
        raise KeyError(f"profile {profile!r} not in {ini_path}")
    return dict(cp[profile])


def configure_s3(
    spark: SparkSession,
    endpoint: str | None = None,
    access_key: str | None = None,
    secret_key: str | None = None,
    path_style: bool = True,
    profile_ini: str | None = None,
    profile: str = "default",
) -> SparkSession:
    """Wire a (possibly custom-endpoint) object store into s3a — the
    CustomAWSConfig analog (reference src/aws.jl:42-64). Credentials may
    come from an INI profile like the reference's config file."""
    if profile_ini:
        p = load_profile(profile_ini, profile)
        endpoint = endpoint or p.get("endpoint_url") or p.get("endpoint")
        access_key = access_key or p.get("aws_access_key_id")
        secret_key = secret_key or p.get("aws_secret_access_key")
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    if endpoint:
        conf.set("fs.s3a.endpoint", endpoint)
    if access_key:
        conf.set("fs.s3a.access.key", access_key)
    if secret_key:
        conf.set("fs.s3a.secret.key", secret_key)
    conf.set("fs.s3a.path.style.access", "true" if path_style else "false")
    # the committer that replaces the reference's per-object upload walk
    conf.set("fs.s3a.committer.name", "magic")
    conf.set("mapreduce.outputcommitter.factory.scheme.s3a",
             "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory")
    return spark
