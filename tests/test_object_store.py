"""K7 object-store write path: conf recipe sanity (always runs) and a real
`s3a://` integration write (skipped unless the environment provides a
bucket + credentials — this container has no S3 and no hadoop-aws jars)."""

from __future__ import annotations

import os

import pytest

from jigsaw_spark.session import object_store_conf

S3_BUCKET = os.environ.get("JIGSAW_S3_TEST_BUCKET")


def test_object_store_conf_recipe():
    conf = object_store_conf(endpoint="http://minio:9000", path_style=True)
    # zero-rename committer wired for both the protocol and parquet layers
    assert conf["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert conf["spark.hadoop.fs.s3a.committer.magic.enabled"] == "true"
    assert "PathOutputCommitProtocol" in conf["spark.sql.sources.commitProtocolClass"]
    assert "BindingParquetOutputCommitter" in conf[
        "spark.sql.parquet.output.committer.class"
    ]
    # streaming multipart upload bounds executor disk
    assert conf["spark.hadoop.fs.s3a.fast.upload"] == "true"
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    # credentials must NOT be baked into the recipe (provider chain only)
    assert not any("access.key" in k or "secret.key" in k for k in conf)
    # default: no endpoint override
    assert "spark.hadoop.fs.s3a.endpoint" not in object_store_conf(path_style=False)


@pytest.mark.skipif(
    not S3_BUCKET,
    reason="set JIGSAW_S3_TEST_BUCKET (and AWS creds + hadoop-aws on the "
    "classpath) to exercise the live s3a:// write path",
)
def test_s3a_roundtrip_write(spark):
    from pyspark.sql import functions as F

    for k, v in object_store_conf().items():
        # committer/fs keys are not runtime-settable on an existing session;
        # a production job passes them at builder time — here we best-effort
        # set what the session accepts and still exercise the write path.
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("bucket")
    )
    dest = f"s3a://{S3_BUCKET}/jigsaw_spark_it/roundtrip"
    df.write.mode("overwrite").partitionBy("bucket").parquet(dest)
    back = spark.read.parquet(dest)
    assert back.count() == 100
    assert back.filter(F.col("bucket") == 3).count() == 20
