"""Spark 4 Python user-defined table functions (UDTF surface).

The engine's policy is built-in expressions first, Arrow kernels second
(SCALE.md §5) — but the UDTF API is part of the modern PySpark surface a
user migrating a table-function workload expects, so one real,
Arrow-optimized UDTF ships here: a text chunker emitting one row per
fixed-width token window. Execution: the UDTF runs per input row inside
the Python worker (Arrow-batched with ``useArrow=True``), composes with
``lateralJoin`` and SQL ``LATERAL``, and its semantics are deliberately
identical to the pure-expression ``operators/text.py`` chunker so the
DuckDB oracle (and a cost comparison) can pin both paths.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string, n_tokens int", useArrow=True)
class ChunkText:
    """One output row per `width`-token window of the lowered
    alphanumeric token stream (no overlap; last chunk may be short)."""

    def eval(self, text: str, width: int):  # noqa: D102
        if text is None or width is None or width <= 0:
            return
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        for i in range(0, len(toks), width):
            piece = toks[i : i + width]
            yield i // width, " ".join(piece), len(piece)


def register_udtfs(spark) -> None:
    """Make the UDTF surface addressable from SQL (`LATERAL chunk_text(...)`)."""
    spark.udtf.register("chunk_text", ChunkText)


def fingerprint_arrow(df, key: str, toks_col: str = "toks"):
    """`mapInArrow` fingerprint kernel: md5 over the canonical token
    stream, operating on pyarrow RecordBatches directly (no pandas
    conversion — the lowest-overhead Python boundary Spark offers).
    Semantics identical to the pure-expression
    ``text.fingerprint_expr`` (parity-tested); exists as the template
    for kernels that need Python libs on byte payloads without paying
    the Arrow→pandas→Arrow double conversion."""
    import hashlib

    import pyarrow as pa

    key_field = df.schema[key]

    def kernel(batches):
        for batch in batches:
            keys = batch.column(key)
            toks = batch.column(toks_col)
            fps = pa.array(
                [
                    hashlib.md5(" ".join(t.as_py()).encode()).hexdigest()
                    for t in toks
                ],
                type=pa.string(),
            )
            yield pa.RecordBatch.from_arrays([keys, fps], names=[key, "fp"])

    out_type = key_field.dataType.simpleString()
    return df.mapInArrow(kernel, f"{key} {out_type}, fp string")
