"""S7: remote payload fetch as a distributed operator (stdlib urllib only).

Reference semantics: jigsaw/io_utils.py:15-41 (`download_image_and_save`,
`load_remote_image`) fetch one URL at a time with `requests` on the driver
machine; io_utils.py:44-60 parallelizes file copies with a 20-thread pool.
Re-expressed Spark-first: the URL table is a DataFrame, the fetch is a
map-only Arrow kernel with a bounded per-task thread pool — so total
concurrency is (tasks × num_threads), controlled and executor-local, and
the fetched bytes land in a `content BINARY` column that composes directly
with decode_image_meta / mask_to_bboxes / extract_features downstream.

Failure contract: errors never kill the job (a 100 TB ingest will always
see dead URLs). Each row gets (status, error); callers filter
`status = 200` or route failures to a dead-letter sink. Retries are
bounded and per-URL.

Scale notes: zero shuffle; fetch bandwidth scales with executor count.
Repartition upstream (`widen`) so the URL list isn't a single scan task;
keep num_threads modest (8-20) to bound per-host connection pressure —
the reference's copy pool uses 20 (io_utils.py:59).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def fetch_urls(
    df: DataFrame,
    url_col: str = "url",
    num_threads: int = 8,
    timeout: float = 10.0,
    max_retries: int = 2,
    headers: dict[str, str] | None = None,
) -> DataFrame:
    """(…, url) → (…, content binary, status int, error string).

    Bounded-concurrency HTTP GET per Arrow batch via a per-task
    ThreadPoolExecutor — stdlib urllib, no external deps. All input
    columns pass through; row order within each batch is preserved."""
    passthrough = df.columns
    schema = (
        ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in passthrough)
        + ", content binary, status int, error string"
    )
    hdrs = dict(headers or {})

    def fetch_one(url: str) -> tuple[bytes | None, int | None, str | None]:
        import time
        import urllib.error
        import urllib.request

        last_err: str | None = None
        for attempt in range(max_retries + 1):
            try:
                req = urllib.request.Request(url, headers=hdrs)
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    return resp.read(), int(resp.status), None
            except urllib.error.HTTPError as e:
                # definitive server answer — do not retry 4xx
                if 400 <= e.code < 500:
                    return None, int(e.code), str(e)
                last_err = str(e)
            except Exception as e:  # URLError, timeout, socket
                last_err = str(e)
            if attempt < max_retries:
                time.sleep(0.1 * (attempt + 1))
        return None, None, last_err

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=num_threads) as pool:
            for pdf in batches:
                results = list(pool.map(fetch_one, (str(u) for u in pdf[url_col])))
                out = pdf[passthrough].copy()
                out["content"] = [r[0] for r in results]
                out["status"] = pd.array(
                    [r[1] for r in results], dtype="Int32"
                )
                out["error"] = [r[2] for r in results]
                yield out

    return df.mapInPandas(op, schema)
