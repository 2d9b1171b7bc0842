"""Granule DataSource V2 (Python Data Source API, Spark 4): the engine's
custom-source form of the granule scan — ``spark.read.format("granule")``.

SURVEY §4 names "a NetCDF DataSource V2 with column pruning" as the one
piece of custom Catalyst-adjacent work the reference's projection pushdown
maps to; ``read_granules`` (granules.py) is the pragmatic ``mapInPandas``
form, and this module is the real source integration:

  - **planning**: one :class:`InputPartition` per granule file — Spark
    schedules decode tasks exactly like the reference's granule thread
    pool (ref sam_extract/main.py:324-329), but across executors.
  - **projection**: the ``variables`` option (default: every schema
    column) reaches the decoder, which never materializes unselected
    variables — the reference's NEEDED∪config projection
    (ref readers/GranuleReader.py:115-117).
  - **filter pushdown** (:meth:`GranuleReader.pushFilters`): scalar
    comparison predicates are absorbed into the scan and applied inside
    the decode task on the pandas batch — rows die before Arrow
    serialization, the DataSource-V2 analog of parquet PushedFilters.
    Unsupported shapes are yielded back for Spark to evaluate.
  - **schema inference**: without an explicit ``.schema(...)``, the first
    granule is decoded once on the driver and its dtypes mapped.
  - **output**: Arrow ``RecordBatch`` per granule (zero row-by-row Python).

The format covers all four corners: batch read (:class:`GranuleReader`),
batch write (:class:`GranuleWriter`, ``df.write.format("granule")``),
streaming read (:class:`GranuleStreamReader`, file-drop offsets), and
streaming write (:class:`GranuleStreamWriter`, per-batch idempotent
manifest).

Register per session with ``spark.dataSource.register(GranuleDataSource)``.
"""

from __future__ import annotations

import glob as globlib
import operator
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    DataSourceWriter,
    DataSourceStreamWriter,
    WriterCommitMessage,
)

from . import granules as granules_mod

_PUSHABLE = {
    EqualTo: operator.eq,
    GreaterThan: operator.gt,
    GreaterThanOrEqual: operator.ge,
    LessThan: operator.lt,
    LessThanOrEqual: operator.le,
}


def _infer_schema(pdf: pd.DataFrame) -> T.StructType:
    fields = [T.StructField("granule", T.StringType())]
    for name in pdf.columns:
        dt = pdf[name].dtype
        if dt == np.int64:
            spark_t: T.DataType = T.LongType()
        elif dt == np.int32:
            spark_t = T.IntegerType()
        elif dt == np.int8:
            spark_t = T.ByteType()
        elif dt == np.float32:
            spark_t = T.FloatType()
        elif dt == np.float64:
            spark_t = T.DoubleType()
        elif dt == object and len(pdf) and isinstance(pdf[name].iloc[0], np.ndarray):
            elem = pdf[name].iloc[0].dtype
            spark_t = T.ArrayType(
                T.FloatType() if elem == np.float32 else T.DoubleType()
            )
        else:
            spark_t = T.StringType()
        fields.append(T.StructField(name, spark_t))
    return T.StructType(fields)


class GranulePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class GranuleReader(DataSourceReader):
    def __init__(self, options, schema: T.StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("granule source requires a path")
        self.fmt = options.get("granule_format", "npz")
        self.out_schema = schema
        variables = options.get("variables")
        self.variables = (
            variables.split(",")
            if variables
            else [f.name for f in schema.fields if f.name != "granule"]
        )
        self.pushed: list = []

    def pushFilters(self, filters):
        for f in filters:
            if type(f) in _PUSHABLE and len(f.attribute) == 1:
                self.pushed.append(f)  # absorbed: applied in read()
            else:
                yield f  # Spark evaluates post-scan

    def partitions(self):
        paths = sorted(globlib.glob(self.path))
        if not paths:
            raise FileNotFoundError(f"no granules match {self.path}")
        return [GranulePartition(p) for p in paths]

    def read(self, partition: GranulePartition) -> Iterator:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        decoder = granules_mod.DECODERS[self.fmt]
        with open(partition.path, "rb") as fh:
            pdf = decoder(fh.read(), self.variables)
        pdf["granule"] = partition.path.rsplit("/", 1)[-1]
        for f in self.pushed:
            col = f.attribute[0]
            if col in pdf.columns:
                pdf = pdf[_PUSHABLE[type(f)](pdf[col], f.value)]
        out_cols = [f.name for f in self.out_schema.fields]
        for c in out_cols:
            if c not in pdf.columns:
                pdf[c] = None
        arrow_schema = to_arrow_schema(self.out_schema)
        yield pa.RecordBatch.from_pandas(
            pdf[out_cols], schema=arrow_schema, preserve_index=False
        )


class GranuleDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "granule"

    def schema(self) -> T.StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("granule source requires a path")
        paths = sorted(globlib.glob(path))
        if not paths:
            raise FileNotFoundError(f"no granules match {path}")
        fmt = self.options.get("granule_format", "npz")
        variables = self.options.get("variables")
        with open(paths[0], "rb") as fh:
            pdf = granules_mod.DECODERS[fmt](
                fh.read(), variables.split(",") if variables else None
            )
        return _infer_schema(pdf)

    def reader(self, schema: T.StructType) -> GranuleReader:
        return GranuleReader(self.options, schema)

    def simpleStreamReader(self, schema: T.StructType) -> "GranuleStreamReader":
        return GranuleStreamReader(self.options, schema)

    def writer(self, schema: T.StructType, overwrite: bool) -> "GranuleWriter":
        return GranuleWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: T.StructType, overwrite: bool) -> "GranuleStreamWriter":
        return GranuleStreamWriter(self.options, schema)


class GranuleStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the granule scan: a file-drop directory becomes a
    Structured Streaming source — ``spark.readStream.format("granule")``.

    The offset is the set of granule filenames already delivered, so a
    restart from checkpoint resumes exactly (``readBetweenOffsets`` replays
    a committed range deterministically: the file set is the offset
    difference). One RMQ message in the reference = one new granule file
    here (ref main.py:670-803); granule-day cadence means a handful of
    files per batch, well inside the simple (driver-side) reader's remit.
    For executor-side decode at higher file rates, the batch
    :class:`GranuleReader` behind a file-listing stream is the scale path.
    """

    def __init__(self, options, schema: T.StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("granule source requires a path")
        self.fmt = options.get("granule_format", "npz")
        self.out_schema = schema
        variables = options.get("variables")
        self.variables = (
            variables.split(",")
            if variables
            else [f.name for f in schema.fields if f.name != "granule"]
        )

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _rows_for(self, paths: list[str]):
        # a LIST ITERATOR, not a generator: Spark pickles the prefetched
        # records for commit-time replay (generators can't pickle) and its
        # prefetch cache drives the result with next() (bare lists fail)
        decoder = granules_mod.DECODERS[self.fmt]
        out_cols = [f.name for f in self.out_schema.fields]
        rows: list[tuple] = []
        for p in paths:
            with open(p, "rb") as fh:
                pdf = decoder(fh.read(), self.variables)
            pdf["granule"] = p.rsplit("/", 1)[-1]
            for c in out_cols:
                if c not in pdf.columns:
                    pdf[c] = None
            rows.extend(
                tuple(list(v) if isinstance(v, np.ndarray) else v for v in row)
                for row in pdf[out_cols].itertuples(index=False)
            )
        return iter(rows)

    def read(self, start: dict):
        seen = set(start["seen"])
        current = sorted(globlib.glob(self.path))
        new = [p for p in current if p.rsplit("/", 1)[-1] not in seen]
        end = {"seen": sorted(seen | {p.rsplit("/", 1)[-1] for p in new})}
        return self._rows_for(new), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        want = set(end["seen"]) - set(start["seen"])
        paths = [p for p in sorted(globlib.glob(self.path)) if p.rsplit("/", 1)[-1] in want]
        return self._rows_for(paths)


def _np_dtype_for(spark_t: T.DataType):
    if isinstance(spark_t, T.ByteType):
        return np.int8
    if isinstance(spark_t, T.IntegerType):
        return np.int32
    if isinstance(spark_t, T.LongType):
        return np.int64
    if isinstance(spark_t, T.FloatType):
        return np.float32
    return np.float64


class GranuleWriteMessage(WriterCommitMessage):
    def __init__(self, files: list[str]):
        self.files = files


class GranuleWriter(DataSourceWriter):
    """Write path: ``df.write.format("granule").save(dir)`` emits one npz
    file per distinct ``granule`` value in each task (repartition the frame
    by ``granule`` first so a granule's rows land in one task and one
    file) — the engine's runnable dense-export container, mirroring the
    reference's one-file-per-product writers (ref writers/NetCDFWriter.py,
    CoGWriter.py naming discipline).

    Dtypes follow the WRITE schema (byte stays int8, float arrays stay
    float32), and float NaNs are re-encoded as the granule fill value, so
    a write→read round trip through :class:`GranuleReader` is exact.
    ``commit`` writes a ``_SUCCESS`` manifest listing every file reported
    by task commit messages — readers can treat its absence as an aborted
    write (the job-commit contract Hadoop committers give file sinks).
    """

    def __init__(self, options, schema: T.StructType, overwrite: bool):
        import os

        self.path = options.get("path")
        if not self.path:
            raise ValueError("granule sink requires a path")
        self.schema = schema
        os.makedirs(self.path, exist_ok=True)
        if overwrite:
            for f in globlib.glob(os.path.join(self.path, "*.npz")):
                os.remove(f)

    def write(self, rows) -> GranuleWriteMessage:
        import os

        by_granule: dict[str, list] = {}
        for row in rows:
            by_granule.setdefault(row["granule"], []).append(row)
        files = []
        for granule, grp in by_granule.items():
            arrays = {}
            for field in self.schema.fields:
                if field.name == "granule":
                    continue
                vals = [r[field.name] for r in grp]
                if isinstance(field.dataType, T.ArrayType):
                    elem = _np_dtype_for(field.dataType.elementType)
                    arrays[field.name] = np.stack(
                        [np.asarray(v, dtype=elem) for v in vals]
                    )
                else:
                    arr = np.asarray(
                        [np.nan if v is None else v for v in vals],
                        dtype=_np_dtype_for(field.dataType),
                    )
                    if arr.dtype.kind == "f":
                        arr = np.where(
                            np.isnan(arr), granules_mod.FILL_VALUE_DEFAULT, arr
                        )
                    arrays[field.name] = arr
            name = granule if granule.endswith(".npz") else granule + ".npz"
            out = os.path.join(self.path, name)
            np.savez(out, **arrays)
            files.append(name)
        return GranuleWriteMessage(files)

    def commit(self, messages) -> None:
        import os

        files = sorted(f for m in messages if m is not None for f in m.files)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write("\n".join(files))

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is None:
                continue
            for f in m.files:
                try:
                    os.remove(os.path.join(self.path, f))
                except OSError:
                    pass


class GranuleStreamWriter(DataSourceStreamWriter):
    """Streaming write path — ``writeStream.format("granule")``: each
    micro-batch's rows are written as npz granules by the same per-task
    logic as the batch :class:`GranuleWriter`, and ``commit`` appends the
    batch's files to a ``_batches`` manifest keyed by batch id. Replayed
    batches (restart after a crash between sink write and checkpoint
    commit) overwrite the same granule filenames and re-record the same
    manifest line — idempotent, which is what upgrades the source's
    at-least-once delivery to effectively-once end-to-end (the engine's
    standing answer to the reference's ack/requeue semantics,
    ref main.py:715-735).
    """

    def __init__(self, options, schema: T.StructType):
        self._delegate = GranuleWriter(options, schema, overwrite=False)
        self.path = self._delegate.path

    def write(self, rows) -> GranuleWriteMessage:
        return self._delegate.write(rows)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os

        files = sorted(f for m in messages if m is not None for f in m.files)
        record = json.dumps({"batch": batchId, "files": files})
        manifest = os.path.join(self.path, "_batches")
        lines = []
        if os.path.exists(manifest):
            lines = [
                ln
                for ln in open(manifest).read().splitlines()
                if json.loads(ln)["batch"] != batchId  # replay overwrites
            ]
        lines.append(record)
        with open(manifest, "w") as fh:
            fh.write("\n".join(lines) + "\n")

    def abort(self, messages, batchId: int) -> None:
        self._delegate.abort(messages)
