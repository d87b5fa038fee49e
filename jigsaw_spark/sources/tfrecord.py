"""Pure-Python TFRecord sink (no JVM package, no TensorFlow dependency).

Reference: the export stage serializes examples to TFRecord shards of ~1000
records with a `.numexamples` sidecar (jigsaw/write_dataset.py:178-198, K2)
and per-model `export_as_TFExample` projections (K6).

Format (public TensorFlow spec):
  each record = [length: uint64 LE][masked_crc32c(length): uint32 LE]
                [data bytes][masked_crc32c(data): uint32 LE]
  masked_crc = ((crc >> 15 | crc << 17) + 0xa282ead8) & 0xffffffff
  data = tf.train.Example protobuf:
    Example{ features: Features{ feature: map<string, Feature> } }
    Feature = oneof{ BytesList=1, FloatList=2, Int64List=3 }

The protobuf wire encoding is hand-rolled below (varints + length-delimited
fields) — ~60 lines — so executors need nothing beyond stdlib. Writing runs
in `foreachPartition`: one shard per partition, fully parallel, no driver
involvement; pair with `shard_assign`/`repartition(num_shards)` upstream for
the reference's `n//1000+1` shard sizing.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame

# -- crc32c (Castagnoli), table-driven ---------------------------------------

_CRC_TABLE: list[int] = []


def _crc_table() -> list[int]:
    global _CRC_TABLE
    if not _CRC_TABLE:
        poly = 0x82F63B78
        table = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            table.append(c)
        _CRC_TABLE = table
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# -- minimal protobuf encoding ------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _len_delim(field_no: int, payload: bytes) -> bytes:
    return _varint((field_no << 3) | 2) + _varint(len(payload)) + payload


def _bytes_list(values: list[bytes]) -> bytes:
    return b"".join(_len_delim(1, v) for v in values)


def _float_list(values: list[float]) -> bytes:
    packed = struct.pack(f"<{len(values)}f", *values)
    return _len_delim(1, packed) if values else b""


def _int64_list(values: list[int]) -> bytes:
    payload = b"".join(_varint(v & 0xFFFFFFFFFFFFFFFF) for v in values)
    return _len_delim(1, payload) if values else b""


def encode_feature(value) -> bytes:
    """One tf.train.Feature from a Python value (str/bytes/int/float,
    datetime/date — encoded as epoch micros / epoch days int64, the
    TFExample-conventional temporal encoding — or a homogeneous list
    thereof)."""
    import datetime as _dt

    if not isinstance(value, (list, tuple)):
        value = [value]
    value = list(value)
    if not value:
        return b""
    head = value[0]
    if isinstance(head, bytes):
        return _len_delim(1, _bytes_list(value))
    if isinstance(head, str):
        return _len_delim(1, _bytes_list([v.encode() for v in value]))
    if isinstance(head, bool) or isinstance(head, int):
        return _len_delim(3, _int64_list([int(v) for v in value]))
    if isinstance(head, float):
        return _len_delim(2, _float_list([float(v) for v in value]))
    if isinstance(head, _dt.datetime):
        epoch = _dt.datetime(1970, 1, 1, tzinfo=head.tzinfo)

        def _us(v):
            # exact integer micros (float total_seconds() drifts by a few
            # µs for far-future dates: 4e15 µs exceeds a double's exactness)
            d = v - epoch
            return (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds

        return _len_delim(3, _int64_list([_us(v) for v in value]))
    if isinstance(head, _dt.date):
        return _len_delim(
            3,
            _int64_list([(v - _dt.date(1970, 1, 1)).days for v in value]),
        )
    raise TypeError(f"unsupported feature type {type(head)}")


def encode_example(features: dict) -> bytes:
    """tf.train.Example bytes from {name: value} (None values skipped)."""
    entries = b""
    for name in sorted(features):
        value = features[name]
        if value is None:
            continue
        kv = _len_delim(1, name.encode()) + _len_delim(2, encode_feature(value))
        entries += _len_delim(1, kv)
    return _len_delim(1, entries)  # Example.features


def frame_record(data: bytes) -> bytes:
    length = struct.pack("<Q", len(data))
    return (
        length
        + struct.pack("<I", masked_crc(length))
        + data
        + struct.pack("<I", masked_crc(data))
    )


def read_tfrecords(path: str) -> list[bytes]:
    """Spec-test reader: unframe records, verifying both CRCs."""
    out = []
    with open(path, "rb") as f:
        while True:
            head = f.read(8)
            if not head:
                return out
            (length,) = struct.unpack("<Q", head)
            (lcrc,) = struct.unpack("<I", f.read(4))
            assert lcrc == masked_crc(head), "length crc mismatch"
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            assert dcrc == masked_crc(data), "data crc mismatch"
            out.append(data)


def write_tfrecords(
    df: DataFrame, out_dir: str, basename: str = "data", raw_col: str | None = None
) -> None:
    """Write one `<basename>-<partition>.record` shard per partition plus a
    `.numexamples` count sidecar (write_dataset.py:187-188). Rows become
    Examples with one feature per column; pass ``raw_col`` naming a binary
    column of ALREADY-serialized Example bytes (e.g. from
    model_exports.rows_to_tfexamples) to frame those verbatim instead.
    Callers control sharding with `repartition(n)` / `shard_assign`
    upstream."""
    os.makedirs(out_dir, exist_ok=True)
    counts = df.rdd.mapPartitionsWithIndex(
        lambda idx, rows: [_write_partition(idx, rows, out_dir, basename, raw_col)]
    ).collect()
    total = sum(counts)
    with open(os.path.join(out_dir, f"{basename}.numexamples"), "w") as f:
        f.write(str(total))


def _write_partition(
    idx: int, rows, out_dir: str, basename: str, raw_col: str | None = None
) -> int:
    n = 0
    path = os.path.join(out_dir, f"{basename}-{idx:05d}.record")
    with open(path, "wb") as f:
        for row in rows:
            if raw_col is not None:
                f.write(frame_record(bytes(row[raw_col])))
            else:
                f.write(frame_record(encode_example(row.asDict())))
            n += 1
    if n == 0:
        os.remove(path)
    return n


# -- minimal protobuf decoding (the read path) --------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: bytes):
    """Yield (field_no, wire_type, scalar_or_bytes) over one message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field_no, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            v, pos = _read_varint(buf, pos)
        elif wt == 2:  # len-delimited
            ln, pos = _read_varint(buf, pos)
            v = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:  # fixed32
            v = buf[pos : pos + 4]
            pos += 4
        elif wt == 1:  # fixed64
            v = buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field_no, wt, v


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _decode_feature(buf: bytes):
    """One tf.train.Feature → (kind, values) where kind ∈ bytes|float|int64.
    Handles packed (what we and TF write) AND unpacked repeated encodings."""
    for field_no, wt, v in _iter_fields(buf):
        if field_no == 1:  # BytesList
            return "bytes", [b for fn, _, b in _iter_fields(v) if fn == 1]
        if field_no == 2:  # FloatList
            vals: list[float] = []
            for fn, w, x in _iter_fields(v):
                if fn != 1:
                    continue
                if w == 2:  # packed
                    vals.extend(struct.unpack(f"<{len(x) // 4}f", x))
                elif w == 5:
                    vals.extend(struct.unpack("<f", x))
            return "float", vals
        if field_no == 3:  # Int64List
            ivals: list[int] = []
            for fn, w, x in _iter_fields(v):
                if fn != 1:
                    continue
                if w == 2:  # packed varints
                    pos = 0
                    while pos < len(x):
                        n, pos = _read_varint(x, pos)
                        ivals.append(_signed64(n))
                elif w == 0:
                    ivals.append(_signed64(x))
            return "int64", ivals
    return "bytes", []


def decode_example(data: bytes) -> dict[str, tuple[str, list]]:
    """tf.train.Example bytes → {name: (kind, values)} — the inverse of
    encode_example, tolerant of any field order and both repeated
    encodings."""
    out: dict[str, tuple[str, list]] = {}
    for field_no, _, features in _iter_fields(data):
        if field_no != 1:  # Example.features
            continue
        for fn, _, entry in _iter_fields(features):
            if fn != 1:  # Features.feature map entry
                continue
            key = None
            feat = ("bytes", [])
            for efn, _, ev in _iter_fields(entry):
                if efn == 1:
                    key = ev.decode()
                elif efn == 2:
                    feat = _decode_feature(ev)
            if key is not None:
                out[key] = feat
    return out


def upload_tfrecords(
    spark,
    local_dir: str,
    dest_dir: str,
    basename: str = "data",
    delete_local: bool = False,
) -> int:
    """Finalize a locally-written TFRecord shard directory to any Hadoop
    filesystem URI (``s3a://bucket/...``, ``hdfs://``, ``file:///``) via
    the JVM FileSystem API — the lifecycle-upload stage SCALE.md §1.1
    documents for this sink (executors write shards to local scratch with
    plain ``open()``; the driver then moves them through whatever
    committers/credentials the cluster's Hadoop conf provides, so the
    same code path works on S3A with hadoop-aws present and on file://
    in this container — tested on the latter).

    Matches the reference's upload-after-export stage
    (jigsaw/io_utils.py:388-431) without boto3: one round of
    ``copyFromLocalFile`` per shard + the ``.numexamples`` sidecar.
    Returns the number of files uploaded.
    """
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    dst = Path(dest_dir)
    fs = dst.getFileSystem(hconf)
    fs.mkdirs(dst)
    n = 0
    for name in sorted(os.listdir(local_dir)):
        if not (
            name.startswith(basename)
            and (name.endswith(".record") or name.endswith(".numexamples"))
        ):
            continue
        src = Path("file://" + os.path.abspath(os.path.join(local_dir, name)))
        fs.copyFromLocalFile(delete_local, True, src, Path(dest_dir + "/" + name))
        n += 1
    return n
