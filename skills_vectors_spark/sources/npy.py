"""NPY data source: `spark.read.format("npy")` over NumPy matrix files.

The reference's embedding store is a positional .npy matrix
(/root/reference/create_skill_embeddings.py:54-55, np.load at
skills_for_jobs.py:399-400). This source makes that format a
first-class, PARALLEL Spark scan via the Python Data Source API
(Spark 4): the driver reads only the npy header, splits the row
space into input partitions, and each task memory-maps its slice and
emits Arrow RecordBatches — zero-copy from mmap to Arrow, no
driver-side materialization, scales to matrices far larger than any
single executor's memory. Row index becomes an explicit `vec_id`
column (SURVEY §1.3: the positional join made explicit).

Options:
    path          file path (required)
    num_partitions  parallelism of the scan (default 8)
"""

from __future__ import annotations

import ast
from collections.abc import Iterator

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

BATCH_ROWS = 4096


def _read_npy_header(path: str) -> tuple[tuple[int, ...], str, bool, int]:
    """(shape, dtype_str, fortran_order, data_offset) from the npy
    v1/v2 header — plain struct parsing, no numpy import needed on
    the driver path."""
    with open(path, "rb") as f:
        magic = f.read(6)
        if magic != b"\x93NUMPY":
            raise ValueError(f"{path} is not an npy file")
        major, _minor = f.read(1)[0], f.read(1)[0]
        if major == 1:
            hlen = int.from_bytes(f.read(2), "little")
        else:
            hlen = int.from_bytes(f.read(4), "little")
        header = ast.literal_eval(f.read(hlen).decode("latin1").strip())
        offset = f.tell()
    return header["shape"], header["descr"], header["fortran_order"], offset


class NpyScanPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class NpyReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.n_parts = int(options.get("num_partitions", "8"))
        shape, descr, fortran, _ = _read_npy_header(self.path)
        if len(shape) != 2 or fortran:
            raise ValueError("npy source supports 2-D C-order matrices")
        self.n_rows = shape[0]

    def partitions(self) -> list[InputPartition]:
        if self.n_rows == 0:
            # one empty slice: the API requires >=1 partition, and
            # read() over [0, 0) yields nothing
            return [NpyScanPartition(0, 0)]
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            NpyScanPartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: NpyScanPartition) -> Iterator:
        import numpy as np
        import pyarrow as pa

        mat = np.load(self.path, mmap_mode="r")
        for lo in range(partition.start, partition.end, BATCH_ROWS):
            hi = min(lo + BATCH_ROWS, partition.end)
            block = np.asarray(mat[lo:hi], dtype=np.float32)
            ids = pa.array(range(lo, hi), type=pa.int64())
            vecs = pa.FixedSizeListArray.from_arrays(
                pa.array(block.reshape(-1), type=pa.float32()), block.shape[1]
            ).cast(pa.list_(pa.float32()))
            yield pa.RecordBatch.from_arrays([ids, vecs], names=["vec_id", "embedding"])


class NpyDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "npy"

    def schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        )

    def reader(self, schema: T.StructType) -> NpyReader:
        return NpyReader(self.options)


def register_npy_source(spark: SparkSession) -> None:
    """Idempotent registration of the npy format on this session."""
    spark.dataSource.register(NpyDataSource)
