"""File-format connectors: ArcGIS ASCII grids and LAS point clouds.

Reference anchors:
- ArcGIS ASCII raster reader/writer: whitebox-raster/src/arcascii_raster.rs
  (header keys ncols/nrows/xllcorner/yllcorner/cellsize/nodata_value,
  row 0 = north)
- LAS reader: whitebox-lidar/src/las.rs + header.rs:10-40;
  real coords = stored_i32 * scale + offset (las.rs:462,
  point_data.rs:183-193) — transcribed exactly for coordinate parity.

Plan shapes:
- ASCII grid: sc.textFile + zipWithIndex (line order is the row index —
  the one legitimate RDD use: ingest), then a codegen split/posexplode
  into the cells table.
- LAS: spark.read.format("binaryFile") over a directory — one task per
  tile file (LiDAR archives are per-tile by convention, so ingest
  parallelism == file count), numpy structured-dtype decode per file in
  mapInPandas, flags bit-unpacked at ingest (SURVEY §1.3).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, IntegerType, LongType, StringType,
                               StructField, StructType)

from ..functions.raster_math import GridMeta

# ---------------------------------------------------------------------------
# ArcGIS ASCII grid
# ---------------------------------------------------------------------------

_HEADER_KEYS = ("ncols", "nrows", "xllcorner", "yllcorner", "cellsize", "nodata_value")


def read_arc_ascii(spark: SparkSession, path: str) -> tuple[DataFrame, GridMeta]:
    """Parse an ArcGIS ASCII grid into the cells table + GridMeta."""
    lines = spark.sparkContext.textFile(path).zipWithIndex().toDF(["line", "idx"])
    lines = lines.persist()
    hdr_rows = lines.where(F.col("idx") < 6).collect()
    hdr: dict[str, float] = {}
    n_header = 0
    for r in sorted(hdr_rows, key=lambda r: r["idx"]):
        parts = r["line"].split()
        if parts and parts[0].lower() in _HEADER_KEYS:
            hdr[parts[0].lower()] = float(parts[1])
            n_header += 1
    ncols, nrows = int(hdr["ncols"]), int(hdr["nrows"])
    cellsize = hdr["cellsize"]
    nodata = hdr.get("nodata_value", -32768.0)
    west, south = hdr["xllcorner"], hdr["yllcorner"]
    meta = GridMeta(rows=nrows, columns=ncols, north=south + nrows * cellsize,
                    south=south, east=west + ncols * cellsize, west=west,
                    resolution_x=cellsize, resolution_y=cellsize, nodata=nodata)
    cells = (
        lines.where(F.col("idx") >= n_header)
        .selectExpr(f"idx - {n_header} AS row",
                    "POSEXPLODE(SPLIT(TRIM(line), '\\\\s+')) AS (col, sval)")
        .selectExpr("row", "CAST(col AS BIGINT) AS col", "CAST(sval AS DOUBLE) AS value")
    )
    lines.unpersist()
    return cells, meta


def write_arc_ascii(cells: DataFrame, meta: GridMeta, path: str) -> None:
    """Write the cells table as an ArcGIS ASCII grid (single file —
    format exporter for interop, not the scale sink). Missing cells get
    the nodata sentinel."""
    grid = np.full((meta.rows, meta.columns), meta.nodata)
    for r in cells.select("row", "col", "value").toLocalIterator():
        grid[int(r["row"]), int(r["col"])] = r["value"]
    with open(path, "w") as f:
        f.write(f"ncols {meta.columns}\n")
        f.write(f"nrows {meta.rows}\n")
        f.write(f"xllcorner {meta.west!r}\n")
        f.write(f"yllcorner {meta.south!r}\n")
        f.write(f"cellsize {meta.resolution_x!r}\n")
        f.write(f"nodata_value {meta.nodata!r}\n")
        for row in grid:
            f.write(" ".join(repr(v) for v in row) + "\n")


# ---------------------------------------------------------------------------
# LAS 1.2 (point formats 0 and 1)
# ---------------------------------------------------------------------------

LAS_SCHEMA = StructType([
    StructField("source_file", StringType(), False),
    StructField("point_id", LongType(), False),
    StructField("x", DoubleType(), False),
    StructField("y", DoubleType(), False),
    StructField("z", DoubleType(), False),
    StructField("intensity", IntegerType(), False),
    StructField("return_number", IntegerType(), False),
    StructField("num_returns", IntegerType(), False),
    StructField("classification", IntegerType(), False),
    StructField("scan_angle", IntegerType(), False),
    StructField("gps_time", DoubleType(), True),
])

_PT0 = np.dtype([("x", "<i4"), ("y", "<i4"), ("z", "<i4"), ("intensity", "<u2"),
                 ("flags", "u1"), ("classification", "u1"), ("scan_angle", "i1"),
                 ("user_data", "u1"), ("point_source", "<u2")])
_PT1 = np.dtype(_PT0.descr + [("gps_time", "<f8")])


def _decode_las(name: str, buf: bytes) -> pd.DataFrame:
    if buf[:4] != b"LASF":
        raise ValueError(f"{name}: not a LAS file")
    fmt = buf[104]
    n_points = struct.unpack_from("<I", buf, 107)[0]
    offset_to_points = struct.unpack_from("<I", buf, 96)[0]
    rec_len = struct.unpack_from("<H", buf, 105)[0]
    sx, sy, sz, ox, oy, oz = struct.unpack_from("<6d", buf, 131)
    dt = _PT1 if fmt == 1 else _PT0
    raw = np.frombuffer(buf, dtype=np.uint8,
                        count=n_points * rec_len, offset=offset_to_points)
    pts = raw.reshape(n_points, rec_len)[:, : dt.itemsize].copy().view(dt).reshape(n_points)
    flags = pts["flags"]
    out = pd.DataFrame({
        "source_file": name,
        "point_id": np.arange(n_points, dtype=np.int64),
        # the reference's exact transform: stored_i32 * scale + offset
        "x": pts["x"].astype(np.float64) * sx + ox,
        "y": pts["y"].astype(np.float64) * sy + oy,
        "z": pts["z"].astype(np.float64) * sz + oz,
        "intensity": pts["intensity"].astype(np.int32),
        "return_number": (flags & 0b0000_0111).astype(np.int32),
        "num_returns": ((flags >> 3) & 0b0000_0111).astype(np.int32),
        "classification": pts["classification"].astype(np.int32),
        "scan_angle": pts["scan_angle"].astype(np.int32),
        "gps_time": (pts["gps_time"].astype(np.float64) if fmt == 1
                     else np.full(n_points, np.nan)),
    })
    return out


def read_las(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory (or glob) of LAS files into the points table —
    one decode task per tile file."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                yield _decode_las(row["path"].rsplit("/", 1)[-1], bytes(row["content"]))

    return files.mapInPandas(run, schema=LAS_SCHEMA)


def write_las(points: list[dict], path: str, fmt: int = 1,
              scale: tuple[float, float, float] = (0.01, 0.01, 0.01),
              offset: tuple[float, float, float] = (0.0, 0.0, 0.0)) -> None:
    """Minimal LAS 1.2 writer (single file, test/interop fixture path).
    points: list of dicts with x/y/z (+ optional attrs)."""
    dt = _PT1 if fmt == 1 else _PT0
    n = len(points)
    rec = np.zeros(n, dtype=dt)
    for i, p in enumerate(points):
        rec[i]["x"] = round((p["x"] - offset[0]) / scale[0])
        rec[i]["y"] = round((p["y"] - offset[1]) / scale[1])
        rec[i]["z"] = round((p["z"] - offset[2]) / scale[2])
        rec[i]["intensity"] = p.get("intensity", 0)
        rec[i]["flags"] = (p.get("return_number", 1) & 7) | ((p.get("num_returns", 1) & 7) << 3)
        rec[i]["classification"] = p.get("classification", 0)
        rec[i]["scan_angle"] = p.get("scan_angle", 0)
        if fmt == 1:
            rec[i]["gps_time"] = p.get("gps_time", 0.0)
    header = bytearray(227)
    header[0:4] = b"LASF"
    header[24] = 1  # version major
    header[25] = 2  # version minor
    struct.pack_into("<H", header, 94, 227)  # header size
    struct.pack_into("<I", header, 96, 227)  # offset to points
    header[104] = fmt
    struct.pack_into("<H", header, 105, dt.itemsize)
    struct.pack_into("<I", header, 107, n)
    struct.pack_into("<6d", header, 131, *(*[s for s in scale], *[o for o in offset]))
    with open(path, "wb") as f:
        f.write(bytes(header))
        f.write(rec.tobytes())
