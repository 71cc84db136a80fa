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
from pyspark.sql.types import (ArrayType, BooleanType, DoubleType, IntegerType,
                               LongType, StringType, StructField, StructType)

from ..functions.raster_math import GridMeta

# ---------------------------------------------------------------------------
# ArcGIS ASCII grid
# ---------------------------------------------------------------------------

_HEADER_KEYS = ("ncols", "nrows", "xllcorner", "yllcorner", "cellsize", "nodata_value")


def _encoded_row_blocks(cells: DataFrame, meta: GridMeta, encode, fill: float,
                        block_rows: int = 256, reverse: bool = False):
    """Executor-side single-file raster egress: yield (block_index,
    payload bytes) for consecutive row blocks in FILE order.

    The per-cell dense scatter AND the format encode run in the
    executors (applyInPandas over row blocks); the driver receives one
    already-encoded block at a time through an ordered toLocalIterator,
    so driver memory is O(block), never O(raster), and no per-cell
    Python loop runs on the driver. Blocks with no cells are synthesized
    all-fill locally (empty space never shuffles). reverse=True emits
    bottom-up file row order (Surfer / SAGA layouts).

    encode: np.ndarray (h, ncols) float64 -> bytes, pickled to executors.
    """
    rows, ncols = meta.rows, meta.columns
    nblocks = (rows + block_rows - 1) // block_rows

    def h_of(b: int) -> int:
        return min(block_rows, rows - b * block_rows)

    orow = f"({rows - 1}L - row)" if reverse else "row"
    staged = cells.selectExpr(
        f"CAST({orow} DIV {block_rows} AS BIGINT) AS __blk",
        f"CAST({orow} % {block_rows} AS INT) AS __r",
        "CAST(col AS INT) AS __c",
        "CAST(value AS DOUBLE) AS __v",
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["__blk"].iloc[0])
        g = np.full((min(block_rows, rows - b * block_rows), ncols), fill,
                    dtype=np.float64)
        g[pdf["__r"].to_numpy(), pdf["__c"].to_numpy()] = pdf["__v"].to_numpy()
        return pd.DataFrame({"block": [b], "payload": [encode(g)]})

    blocks = staged.groupBy("__blk").applyInPandas(
        build, "block long, payload binary").orderBy("block")
    expect = 0
    for rec in blocks.toLocalIterator():
        b = int(rec["block"])
        while expect < b:
            yield expect, encode(np.full((h_of(expect), ncols), fill, dtype=np.float64))
            expect += 1
        yield b, bytes(rec["payload"])
        expect += 1
    while expect < nblocks:
        yield expect, encode(np.full((h_of(expect), ncols), fill, dtype=np.float64))
        expect += 1


def _value_range(cells: DataFrame, nodata: float) -> tuple[float, float]:
    """(min, max) over non-nodata cells — one tiny distributed agg for
    the headers that need display/z ranges."""
    r = cells.where(F.col("value") != F.lit(float(nodata))).agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")).collect()[0]
    lo = 0.0 if r["lo"] is None else float(r["lo"])
    hi = 0.0 if r["hi"] is None else float(r["hi"])
    return lo, hi


def _ascii_rows_encode(g: np.ndarray) -> bytes:
    return ("".join(" ".join(repr(v) for v in row) + "\n" for row in g)
            ).encode("ascii")


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
    the nodata sentinel. Row blocks are densified + text-encoded in the
    executors; the driver streams finished blocks to the file."""
    with open(path, "wb") as f:
        f.write(f"ncols {meta.columns}\n".encode())
        f.write(f"nrows {meta.rows}\n".encode())
        f.write(f"xllcorner {meta.west!r}\n".encode())
        f.write(f"yllcorner {meta.south!r}\n".encode())
        f.write(f"cellsize {meta.resolution_x!r}\n".encode())
        f.write(f"nodata_value {meta.nodata!r}\n".encode())
        for _b, payload in _encoded_row_blocks(cells, meta, _ascii_rows_encode,
                                               meta.nodata):
            f.write(payload)


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
    StructField("scan_direction", IntegerType(), False),
    StructField("edge_flag", IntegerType(), False),
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
        "scan_direction": ((flags >> 6) & 1).astype(np.int32),
        "edge_flag": ((flags >> 7) & 1).astype(np.int32),
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


def read_zlidar(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory (or glob) of .zlidar files into the points
    table — one decode task per tile file (sources/zlidar.py codec,
    whitebox-lidar/src/las.rs:1421-2520 decode rules)."""
    from .zlidar import decode_zlidar

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                df = decode_zlidar(bytes(row["content"]))
                df.insert(0, "source_file", row["path"].rsplit("/", 1)[-1])
                yield df

    return files.mapInPandas(run, schema=LAS_SCHEMA)


def _encode_las_arrays(n: int, get, fmt: int, scale, offset) -> bytes:
    """Vectorized LAS 1.2 encode: get(name, default) -> np.ndarray of
    length n (or None to use the default). Returns the full file bytes."""
    dt = _PT1 if fmt == 1 else _PT0
    rec = np.zeros(n, dtype=dt)

    def col(name, default=0):
        v = get(name, None)
        return (np.full(n, default) if v is None else np.asarray(v))

    rec["x"] = np.round((col("x", 0.0) - offset[0]) / scale[0])
    rec["y"] = np.round((col("y", 0.0) - offset[1]) / scale[1])
    rec["z"] = np.round((col("z", 0.0) - offset[2]) / scale[2])
    rec["intensity"] = col("intensity")
    rec["flags"] = ((col("return_number", 1).astype(np.int64) & 7)
                    | ((col("num_returns", 1).astype(np.int64) & 7) << 3)
                    | ((col("scan_direction").astype(np.int64) & 1) << 6)
                    | ((col("edge_flag").astype(np.int64) & 1) << 7))
    rec["classification"] = col("classification")
    rec["scan_angle"] = col("scan_angle")
    if fmt == 1:
        gps = col("gps_time", 0.0).astype(np.float64)
        rec["gps_time"] = np.nan_to_num(gps, nan=0.0)
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
    return bytes(header) + rec.tobytes()


def write_las(points: list[dict], path: str, fmt: int = 1,
              scale: tuple[float, float, float] = (0.01, 0.01, 0.01),
              offset: tuple[float, float, float] = (0.0, 0.0, 0.0)) -> None:
    """Minimal LAS 1.2 writer (single file, test/interop fixture path).
    points: list of dicts with x/y/z (+ optional attrs)."""
    n = len(points)
    defaults = {"return_number": 1, "num_returns": 1, "gps_time": 0.0}

    def get(name, _default):
        d = defaults.get(name, 0)
        return np.array([p.get(name, d) for p in points]) if n else None

    with open(path, "wb") as f:
        f.write(_encode_las_arrays(n, get, fmt, scale, offset))


def write_lidar_tiles(points: DataFrame, out_dir: str,
                      tile_col: str = "tile_id", fmt: int = 1,
                      scale: tuple[float, float, float] = (0.01, 0.01, 0.01),
                      offset: tuple[float, float, float] = (0.0, 0.0, 0.0),
                      codec: str = "las") -> DataFrame:
    """Distributed LiDAR egress: one LAS (or zLidar) file per tile,
    encoded AND written inside the executors — the per-tile convention
    LiDAR archives already use, so egress parallelism == tile count and
    no point ever crosses the driver. Returns the small manifest
    (tile, path, n_points); out_dir must be a filesystem the executors
    can write (shared FS / mount on a real cluster).

    points: LAS_SCHEMA-shaped DataFrame plus the tile_col. Points are
    ordered by point_id within each tile for deterministic files."""
    import os as _os

    _os.makedirs(out_dir, exist_ok=True)
    cols = [c for c in points.columns]
    if tile_col not in cols:
        raise ValueError(f"points needs a {tile_col} column")

    def write_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        tile = pdf[tile_col].iloc[0]
        if "point_id" in pdf.columns:
            pdf = pdf.sort_values("point_id")
        path = _os.path.join(out_dir, f"tile_{tile}.{codec}")
        n = len(pdf)
        if codec == "las":
            def get(name, _default):
                return pdf[name].to_numpy() if name in pdf.columns else None
            with open(path, "wb") as f:
                f.write(_encode_las_arrays(n, get, fmt, scale, offset))
        elif codec == "zlidar":
            from .zlidar import write_zlidar as _wz
            recs = pdf.rename(columns={"z": "value"}).to_dict("records")
            _wz(recs, path, fmt=fmt, scale=scale, offset=offset)
        else:
            raise ValueError(f"unknown LiDAR codec {codec}")
        return pd.DataFrame({"tile": [tile], "path": [path], "n_points": [n]})

    tile_type = points.schema[tile_col].dataType.simpleString()
    return points.groupBy(tile_col).applyInPandas(
        write_tile, f"tile {tile_type}, path string, n_points long")


# ---------------------------------------------------------------------------
# GeoTIFF (whitebox-raster/src/geotiff/mod.rs — strip/tile layout,
# DEFLATE at mod.rs:14,456; georeferencing via ModelPixelScale +
# ModelTiepoint; nodata via GDAL_NODATA)
# ---------------------------------------------------------------------------

_TIFF_SAMPLE_DTYPES = {
    # (sample_format, bits) -> numpy dtype char
    (1, 8): "u1", (1, 16): "u2", (1, 32): "u4",
    (2, 8): "i1", (2, 16): "i2", (2, 32): "i4",
    (3, 32): "f4", (3, 64): "f8",
}


def _parse_tiff(buf: bytes) -> tuple[np.ndarray, dict]:
    """Decode a single-band classic TIFF (strips or tiles; compression
    none/DEFLATE) into (2-D array, info dict with pixel scale, tiepoint,
    nodata)."""
    import zlib

    bo = {b"II": "<", b"MM": ">"}.get(buf[:2])
    if bo is None or struct.unpack_from(f"{bo}H", buf, 2)[0] != 42:
        raise ValueError("not a classic TIFF")
    ifd_off = struct.unpack_from(f"{bo}I", buf, 4)[0]
    n_tags = struct.unpack_from(f"{bo}H", buf, ifd_off)[0]
    tags: dict[int, tuple] = {}
    type_size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8}
    type_code = {1: "B", 3: "H", 4: "I", 11: "f", 12: "d"}
    for i in range(n_tags):
        off = ifd_off + 2 + i * 12
        tag, typ, cnt = struct.unpack_from(f"{bo}HHI", buf, off)
        size = type_size.get(typ, 1) * cnt
        voff = off + 8 if size <= 4 else struct.unpack_from(f"{bo}I", buf, off + 8)[0]
        if typ == 2:
            vals = buf[voff:voff + cnt].split(b"\x00")[0].decode("ascii", "ignore")
        else:
            code = type_code.get(typ)
            if code is None:
                continue
            vals = struct.unpack_from(f"{bo}{cnt}{code}", buf, voff)
        tags[tag] = vals

    width = tags[256][0]
    height = tags[257][0]
    bits = tags.get(258, (32,))[0]
    compression = tags.get(259, (1,))[0]
    sample_format = tags.get(339, (1,))[0]
    if tags.get(277, (1,))[0] != 1:
        raise ValueError("multi-band TIFF not supported (one band per file)")
    dt = np.dtype(bo + _TIFF_SAMPLE_DTYPES[(sample_format, bits)])

    def chunks(offsets, counts):
        for o, c in zip(offsets, counts):
            raw = buf[o:o + c]
            if compression in (8, 32946):
                raw = zlib.decompress(raw)
            elif compression != 1:
                raise ValueError(f"unsupported TIFF compression {compression}")
            yield np.frombuffer(raw, dtype=dt)

    grid = np.empty((height, width), dtype=np.float64)
    if 322 in tags:  # tiled
        tw, th = tags[322][0], tags[323][0]
        tiles_across = (width + tw - 1) // tw
        for idx, data in enumerate(chunks(tags[324], tags[325])):
            tr, tc = idx // tiles_across, idx % tiles_across
            tile = data.reshape(th, tw)
            r0, c0 = tr * th, tc * tw
            h = min(th, height - r0)
            w = min(tw, width - c0)
            grid[r0:r0 + h, c0:c0 + w] = tile[:h, :w]
    else:  # strips
        rps = tags.get(278, (height,))[0]
        r0 = 0
        for data in chunks(tags[273], tags[279]):
            h = min(rps, height - r0)
            grid[r0:r0 + h, :] = data[: h * width].reshape(h, width)
            r0 += h
    info = {
        "width": width, "height": height,
        "pixel_scale": tags.get(33550),
        "tiepoint": tags.get(33922),
        "nodata": float(tags[42113]) if 42113 in tags else None,
    }
    return grid, info


def geotiff_meta(buf: bytes) -> GridMeta:
    """GridMeta from one GeoTIFF's georeferencing tags."""
    _, info = _parse_tiff(buf)
    sx, sy = info["pixel_scale"][0], info["pixel_scale"][1]
    # tiepoint (i, j, k, x, y, z): raster point -> model point
    ti, tj = info["tiepoint"][0], info["tiepoint"][1]
    tx, ty = info["tiepoint"][3], info["tiepoint"][4]
    west = tx - ti * sx
    north = ty + tj * sy
    return GridMeta(
        rows=info["height"], columns=info["width"],
        north=north, south=north - info["height"] * sy,
        east=west + info["width"] * sx, west=west,
        resolution_x=sx, resolution_y=sy,
        nodata=info["nodata"] if info["nodata"] is not None else -32768.0,
    )


def read_geotiff(spark: SparkSession, path: str) -> tuple[DataFrame, GridMeta]:
    """Read a GeoTIFF file (or a directory of aligned tiles) into the
    cells table + the union GridMeta.

    Plan: one metadata pass (binaryFile -> per-file GridMeta rows,
    driver combines the tiny result), then one decode pass — each file
    becomes (row, col, value) cells with GLOBAL indices derived from its
    own tiepoint, so a directory of tiles lands as one seamless raster.
    One decode task per tile file (the LAS ingest pattern). For huge
    single files, prefer tiled TIFFs — each file is decoded whole."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def meta_pass(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # headers are parsed in the EXECUTORS; only the tiny per-file
        # GridMeta rows travel to the driver (never the file bytes)
        for pdf in batches:
            for _, r in pdf.iterrows():
                m = geotiff_meta(bytes(r["content"]))
                yield pd.DataFrame([{
                    "rows": m.rows, "columns": m.columns,
                    "north": m.north, "south": m.south,
                    "east": m.east, "west": m.west,
                    "resolution_x": m.resolution_x,
                    "resolution_y": m.resolution_y,
                    "nodata": float(m.nodata),
                }])

    meta_schema = ("rows long, columns long, north double, south double, "
                   "east double, west double, resolution_x double, "
                   "resolution_y double, nodata double")
    metas = [
        GridMeta(rows=int(r["rows"]), columns=int(r["columns"]),
                 north=r["north"], south=r["south"], east=r["east"],
                 west=r["west"], resolution_x=r["resolution_x"],
                 resolution_y=r["resolution_y"], nodata=r["nodata"])
        for r in files.mapInPandas(meta_pass, schema=meta_schema).collect()
    ]
    if not metas:
        raise ValueError(f"no TIFF files at {path}")
    m0 = metas[0]
    union = GridMeta(
        rows=0, columns=0,
        north=max(m.north for m in metas), south=min(m.south for m in metas),
        east=max(m.east for m in metas), west=min(m.west for m in metas),
        resolution_x=m0.resolution_x, resolution_y=m0.resolution_y,
        nodata=m0.nodata,
    )
    union = GridMeta(
        rows=int(round((union.north - union.south) / m0.resolution_y)),
        columns=int(round((union.east - union.west) / m0.resolution_x)),
        north=union.north, south=union.south, east=union.east, west=union.west,
        resolution_x=m0.resolution_x, resolution_y=m0.resolution_y,
        nodata=m0.nodata,
    )
    north, west = union.north, union.west
    sx, sy = m0.resolution_x, m0.resolution_y

    schema = StructType([
        StructField("row", LongType(), False),
        StructField("col", LongType(), False),
        StructField("value", DoubleType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, file_row in pdf.iterrows():
                buf = bytes(file_row["content"])
                grid, _info = _parse_tiff(buf)
                m = geotiff_meta(buf)
                r_off = int(round((north - m.north) / sy))
                c_off = int(round((m.west - west) / sx))
                h, w = grid.shape
                rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
                yield pd.DataFrame({
                    "row": (rr.ravel() + r_off).astype(np.int64),
                    "col": (cc.ravel() + c_off).astype(np.int64),
                    "value": grid.ravel().astype(np.float64),
                })

    return files.mapInPandas(run, schema=schema), union


def write_geotiff(cells: DataFrame, meta: GridMeta, path: str,
                  compress: bool = False, block_rows: int = 256) -> None:
    """Write the cells table as a single-band float64 GeoTIFF (strip
    layout, one strip per row block, optional per-strip DEFLATE;
    interop/test sink — the scale sink is parquet).

    Streaming layout: 8-byte header (IFD offset patched at the end) ->
    strip payloads in row order as the executors deliver them -> IFD +
    out-of-line tag data appended last. Driver memory is O(strip);
    densify + compress run executor-side."""
    import zlib

    def enc(g: np.ndarray) -> bytes:
        data = g.astype("<f8").tobytes()
        return zlib.compress(data) if compress else data

    compression = 8 if compress else 1
    nodata_s = (repr(meta.nodata) + "\x00").encode("ascii")
    offsets: list[int] = []
    counts: list[int] = []
    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<HI", 42, 0))  # IFD offset patched below
        for _b, payload in _encoded_row_blocks(cells, meta, enc, meta.nodata,
                                               block_rows=block_rows):
            offsets.append(f.tell())
            counts.append(len(payload))
            f.write(payload)
        ifd_off = f.tell()
        n_tags = 11
        data_start = ifd_off + 2 + n_tags * 12 + 4
        extra = bytearray()

        def defer(payload: bytes) -> int:
            extra.extend(payload)
            return len(extra) - len(payload)

        off_scale = defer(struct.pack("<3d", meta.resolution_x,
                                      meta.resolution_y, 0.0))
        off_tie = defer(struct.pack("<6d", 0.0, 0.0, 0.0,
                                    meta.west, meta.north, 0.0))
        off_nodata = defer(nodata_s)

        def tag(t, typ, cnt, val, deferred=False):
            v = data_start + val if deferred else val
            return struct.pack("<HHI4s", t, typ, cnt, struct.pack("<I", v))

        nstrips = len(offsets)
        if nstrips == 1:
            tag273 = tag(273, 4, 1, offsets[0])
            tag279 = tag(279, 4, 1, counts[0])
        else:
            tag273 = tag(273, 4, nstrips,
                         defer(struct.pack(f"<{nstrips}I", *offsets)), deferred=True)
            tag279 = tag(279, 4, nstrips,
                         defer(struct.pack(f"<{nstrips}I", *counts)), deferred=True)

        ifd = struct.pack("<H", n_tags)
        ifd += tag(256, 4, 1, meta.columns)
        ifd += tag(257, 4, 1, meta.rows)
        ifd += tag(258, 3, 1, 64)
        ifd += tag(259, 3, 1, compression)
        ifd += tag273
        ifd += tag(278, 4, 1, block_rows)
        ifd += tag279
        ifd += tag(339, 3, 1, 3)
        ifd += tag(33550, 12, 3, off_scale, deferred=True)
        ifd += tag(33922, 12, 6, off_tie, deferred=True)
        ifd += tag(42113, 2, len(nodata_s), off_nodata, deferred=True)
        ifd += struct.pack("<I", 0)
        f.write(ifd)
        f.write(bytes(extra))
        f.seek(4)
        f.write(struct.pack("<I", ifd_off))


# ---------------------------------------------------------------------------
# ESRI Shapefile (.shp geometry + .dbf attributes;
# whitebox-vector/src/shapefile/mod.rs:112-130, attributes.rs:60-111,
# geometry.rs:307-409 — holes are counter-clockwise rings)
# ---------------------------------------------------------------------------

SHP_PARTS_SCHEMA = StructType([
    StructField("source_file", StringType(), False),
    StructField("record_num", LongType(), False),
    StructField("shape_type", IntegerType(), False),
    StructField("parts", ArrayType(StructType([
        StructField("part_idx", IntegerType(), False),
        StructField("is_hole", BooleanType(), False),
        StructField("ring", ArrayType(StructType([
            StructField("x", DoubleType(), False),
            StructField("y", DoubleType(), False)])), False),
    ])), False),
])


def _ring_area2(xs: np.ndarray, ys: np.ndarray) -> float:
    return float(np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1]))


def _decode_shp(name: str, buf: bytes) -> pd.DataFrame:
    if struct.unpack_from(">i", buf, 0)[0] != 9994:
        raise ValueError(f"{name}: not a shapefile")
    recs = []
    pos = 100  # header is 100 bytes
    while pos + 8 <= len(buf):
        rec_num, content_len = struct.unpack_from(">ii", buf, pos)
        pos += 8
        body = buf[pos:pos + content_len * 2]
        pos += content_len * 2
        if len(body) < 4:
            break
        stype = struct.unpack_from("<i", body, 0)[0]
        parts_out = []
        if stype == 1:  # Point
            x, y = struct.unpack_from("<2d", body, 4)
            parts_out = [(0, False, [(x, y)])]
        elif stype == 8:  # MultiPoint
            n = struct.unpack_from("<i", body, 36)[0]
            pts = np.frombuffer(body, dtype="<f8", count=2 * n, offset=40).reshape(n, 2)
            parts_out = [(0, False, [tuple(p) for p in pts])]
        elif stype in (3, 5):  # PolyLine / Polygon
            n_parts, n_points = struct.unpack_from("<2i", body, 36)
            part_starts = list(struct.unpack_from(f"<{n_parts}i", body, 44))
            pts = np.frombuffer(body, dtype="<f8", count=2 * n_points,
                                offset=44 + 4 * n_parts).reshape(n_points, 2)
            bounds = part_starts + [n_points]
            for pi in range(n_parts):
                ring = pts[bounds[pi]:bounds[pi + 1]]
                is_hole = False
                if stype == 5 and len(ring) >= 4:
                    # ESRI: shells clockwise, holes counter-clockwise
                    # (positive shoelace area), geometry.rs:307-409
                    is_hole = _ring_area2(ring[:, 0], ring[:, 1]) > 0
                parts_out.append((pi, is_hole, [tuple(p) for p in ring]))
        elif stype == 0:  # null shape
            parts_out = []
        else:
            raise ValueError(f"{name}: unsupported shape type {stype}")
        recs.append((name, rec_num, stype, [
            {"part_idx": i, "is_hole": h,
             "ring": [{"x": float(x), "y": float(y)} for x, y in ring]}
            for i, h, ring in parts_out
        ]))
    return pd.DataFrame(recs, columns=["source_file", "record_num", "shape_type", "parts"])


def read_shapefile(spark: SparkSession, path: str) -> DataFrame:
    """Read .shp files (Point / MultiPoint / PolyLine / Polygon) into
    the features table (record_num, shape_type, parts) — one decode
    task per file."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, r in pdf.iterrows():
                yield _decode_shp(r["path"].rsplit("/", 1)[-1], bytes(r["content"]))

    return files.mapInPandas(run, schema=SHP_PARTS_SCHEMA)


def _decode_dbf(name: str, buf: bytes) -> pd.DataFrame:
    n_recs = struct.unpack_from("<I", buf, 4)[0]
    header_size, rec_size = struct.unpack_from("<2H", buf, 8)
    fields = []
    pos = 32
    while buf[pos] != 0x0D:
        fname = buf[pos:pos + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(buf[pos + 11])
        flen = buf[pos + 16]
        fdec = buf[pos + 17]
        fields.append((fname, ftype, flen, fdec))
        pos += 32
    rows = []
    for i in range(n_recs):
        off = header_size + i * rec_size
        rec = buf[off:off + rec_size]
        if not rec or rec[0:1] == b"*":
            continue
        vals = {"record_num": i + 1}
        fp = 1
        for fname, ftype, flen, fdec in fields:
            raw = rec[fp:fp + flen].decode("ascii", "ignore").strip()
            fp += flen
            if ftype in ("N", "F"):
                if raw == "":
                    vals[fname] = None
                elif fdec > 0 or ftype == "F":
                    vals[fname] = float(raw)
                else:
                    vals[fname] = int(raw)
            elif ftype == "L":
                vals[fname] = raw.upper() in ("T", "Y")
            else:
                vals[fname] = raw
        rows.append(vals)
    return pd.DataFrame(rows)


def _dbf_field_descriptors(buf: bytes) -> list[tuple[str, str, int, int]]:
    """Parse just the field-descriptor block of a .dbf header."""
    fields = []
    pos = 32
    while buf[pos] != 0x0D:
        fname = buf[pos:pos + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(buf[pos + 11])
        flen = buf[pos + 16]
        fdec = buf[pos + 17]
        fields.append((fname, ftype, flen, fdec))
        pos += 32
    return fields


def read_dbf(spark: SparkSession, path: str) -> DataFrame:
    """Read .dbf attribute tables (C/N/F/L field types,
    attributes.rs:60-111); 1-based record_num aligns with the .shp
    record numbers.

    The Spark schema comes from the FIRST file's field descriptors
    (driver reads one file's bytes, O(1) in the tile count); record
    decode then runs in the executors, one task per file — the
    binaryFile + mapInPandas pattern shared with read_las/read_geotiff,
    so the dataset bytes never land on the driver."""
    from pyspark.sql.types import BooleanType, DoubleType, StringType

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    # deterministic schema file: lowest path wins (limit(1) over an unordered
    # multi-file listing is nondeterministic)
    head = files.orderBy("path").limit(1).collect()
    if not head:
        raise ValueError(f"no DBF files at {path}")
    fields = _dbf_field_descriptors(bytes(head[0]["content"]))
    sf = [StructField("record_num", LongType(), False)]
    for fname, ftype, flen, fdec in fields:
        if ftype in ("N", "F"):
            sf.append(StructField(
                fname, DoubleType() if (fdec > 0 or ftype == "F") else LongType()))
        elif ftype == "L":
            sf.append(StructField(fname, BooleanType()))
        else:
            sf.append(StructField(fname, StringType()))
    schema = StructType(sf)
    cols = [f.name for f in sf]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, r in pdf.iterrows():
                dec = _decode_dbf(path, bytes(r["content"]))
                missing = [c for c in cols if c not in dec.columns]
                if missing:
                    raise ValueError(
                        f"DBF file {r['path']} is missing fields {missing} "
                        f"present in the schema file (field layout must match "
                        f"across all files under {path})")
                yield dec[cols]

    return files.mapInPandas(run, schema=schema)


def write_shapefile(features: list[dict], path: str, shape_type: int = 5) -> None:
    """Minimal .shp/.shx/.dbf writer (Polygon=5 / PolyLine=3 / Point=1 /
    MultiPoint=8; test and interop fixture path). features:
    [{'record_num', 'parts': [(is_hole, [(x, y), ...])], 'attrs':
    {name: value}}]. Polygon rings are re-oriented to the ESRI
    convention (shells CW, holes CCW); Point records take the first
    vertex, MultiPoint records flatten all vertices."""
    shp_records = []
    all_x, all_y = [], []
    for feat in features:
        if shape_type == 1:
            x, y = feat["parts"][0][1][0]
            all_x.append(x)
            all_y.append(y)
            shp_records.append(struct.pack("<i2d", 1, x, y))
            continue
        if shape_type == 8:
            pts = [p for _h, ring in feat["parts"] for p in ring]
            all_x += [p[0] for p in pts]
            all_y += [p[1] for p in pts]
            body = struct.pack("<i", 8)
            body += struct.pack("<4d", min(p[0] for p in pts),
                                min(p[1] for p in pts),
                                max(p[0] for p in pts),
                                max(p[1] for p in pts))
            body += struct.pack("<i", len(pts))
            for x, y in pts:
                body += struct.pack("<2d", x, y)
            shp_records.append(body)
            continue
        parts = []
        for is_hole, ring in feat["parts"]:
            r = list(ring)
            if r[0] != r[-1]:
                r.append(r[0])
            xs = np.array([p[0] for p in r])
            ys = np.array([p[1] for p in r])
            a2 = _ring_area2(xs, ys)
            if shape_type == 5 and ((not is_hole and a2 > 0) or (is_hole and a2 < 0)):
                r = r[::-1]
            parts.append(r)
            all_x += [p[0] for p in r]
            all_y += [p[1] for p in r]
        pts = [p for ring in parts for p in ring]
        starts = []
        acc = 0
        for ring in parts:
            starts.append(acc)
            acc += len(ring)
        body = struct.pack("<i", shape_type)
        body += struct.pack("<4d", min(p[0] for p in pts), min(p[1] for p in pts),
                            max(p[0] for p in pts), max(p[1] for p in pts))
        body += struct.pack("<2i", len(parts), len(pts))
        body += struct.pack(f"<{len(starts)}i", *starts)
        for x, y in pts:
            body += struct.pack("<2d", x, y)
        shp_records.append(body)

    # .shp + .shx
    offsets = []
    content = b""
    for i, body in enumerate(shp_records):
        offsets.append((100 + len(content)) // 2)
        content += struct.pack(">2i", i + 1, len(body) // 2) + body
    bbox = (min(all_x), min(all_y), max(all_x), max(all_y))

    def header(total_words):
        h = struct.pack(">i5i i", 9994, 0, 0, 0, 0, 0, total_words)
        h += struct.pack("<2i", 1000, shape_type)
        h += struct.pack("<4d", *bbox) + struct.pack("<4d", 0, 0, 0, 0)
        return h

    with open(path, "wb") as f:
        f.write(header((100 + len(content)) // 2))
        f.write(content)
    with open(path[:-4] + ".shx", "wb") as f:
        f.write(header((100 + 8 * len(shp_records)) // 2))
        for off, body in zip(offsets, shp_records):
            f.write(struct.pack(">2i", off, len(body) // 2))

    # .dbf
    attr_names = list(features[0].get("attrs", {"FID": 0}))
    if not features[0].get("attrs"):
        features = [dict(f, attrs={"FID": i}) for i, f in enumerate(features)]
    fdefs = []
    for nm in attr_names:
        v = features[0]["attrs"][nm]
        if isinstance(v, float):
            fdefs.append((nm, "N", 19, 8))
        elif isinstance(v, int):
            fdefs.append((nm, "N", 18, 0))
        else:
            fdefs.append((nm, "C", 64, 0))
    rec_size = 1 + sum(f[2] for f in fdefs)
    header_size = 32 + 32 * len(fdefs) + 1
    with open(path[:-4] + ".dbf", "wb") as f:
        hdr = bytearray(32)
        hdr[0] = 3
        struct.pack_into("<I", hdr, 4, len(features))
        struct.pack_into("<2H", hdr, 8, header_size, rec_size)
        f.write(bytes(hdr))
        for nm, t, ln, dec in fdefs:
            fd = bytearray(32)
            fd[0:11] = nm.encode("ascii")[:11].ljust(11, b"\x00")
            fd[11] = ord(t)
            fd[16] = ln
            fd[17] = dec
            f.write(bytes(fd))
        f.write(b"\x0d")
        for feat in features:
            f.write(b" ")
            for nm, t, ln, dec in fdefs:
                v = feat["attrs"][nm]
                if t == "N":
                    s = (f"{v:.{dec}f}" if dec else str(int(v))).rjust(ln)[:ln]
                else:
                    s = str(v).ljust(ln)[:ln]
                f.write(s.encode("ascii"))
        f.write(b"\x1a")


def print_geotiff_tags(path: str) -> dict:
    """PrintGeoTiffTags (data_tools/print_geotiff_tags.rs analog):
    decode one GeoTIFF's structural + geo tags into a dict (driver-side
    inspection utility over the same parser the reader uses)."""
    with open(path, "rb") as f:
        buf = f.read()
    grid, info = _parse_tiff(buf)
    meta = geotiff_meta(buf)
    return {
        "width": info["width"],
        "height": info["height"],
        "pixel_scale": tuple(info["pixel_scale"][:2]) if info["pixel_scale"] else None,
        "tiepoint": tuple(info["tiepoint"][:6]) if info["tiepoint"] else None,
        "nodata": info["nodata"],
        "west": meta.west, "north": meta.north,
        "east": meta.east, "south": meta.south,
        "min_value": float(grid.min()),
        "max_value": float(grid.max()),
    }


# ---------------------------------------------------------------------------
# Round-2 continuation: additional grid formats
# (whitebox-raster/src/{surfer_ascii_raster,grass_raster,whitebox_raster,
#  idrisi_raster,arcbinary_raster}.rs)
# ---------------------------------------------------------------------------


def read_surfer_ascii(spark: SparkSession, path: str) -> tuple[DataFrame, GridMeta]:
    """Surfer ASCII grid (.grd, DSAA magic; surfer_ascii_raster.rs:35-105):
    header lines = [DSAA, "ncols nrows", "west east", "south north",
    "zmin zmax"]; data runs row-major BOTTOM-to-top (:52)."""
    lines = spark.sparkContext.textFile(path).zipWithIndex().toDF(["line", "idx"])
    lines = lines.persist()
    hdr = [r["line"].split() for r in
           sorted(lines.where("idx < 5").collect(), key=lambda r: r["idx"])]
    assert hdr[0][0].lower() == "dsaa", "not a Surfer ASCII grid"
    ncols, nrows = int(hdr[1][0]), int(hdr[1][1])
    west, east = float(hdr[2][0]), float(hdr[2][1])
    south, north = float(hdr[3][0]), float(hdr[3][1])
    meta = GridMeta(rows=nrows, columns=ncols, north=north, south=south,
                    east=east, west=west,
                    resolution_x=(east - west) / ncols,
                    resolution_y=(north - south) / nrows, nodata=1.71041e38)
    # Surfer wraps long rows; index cells by running value position
    cells = (
        lines.where("idx >= 5")
        .selectExpr("idx", "POSEXPLODE(SPLIT(TRIM(line), '\\\\s+')) AS (p, sval)")
        .where("sval <> ''")
    )
    # global value ordinal via per-line counts (lines can hold any number
    # of values) — distributed rank over (idx, p)
    from ..plans.rank import global_row_number

    ranked, _n = global_row_number(cells, ["idx", "p"], out="__ord")
    return (
        ranked.selectExpr(
            f"{nrows - 1} - CAST((__ord - 1) DIV {ncols} AS BIGINT) AS row",
            f"CAST((__ord - 1) % {ncols} AS BIGINT) AS col",
            "CAST(sval AS DOUBLE) AS value",
        ),
        meta,
    )


def write_surfer_ascii(cells: DataFrame, meta: GridMeta, path: str) -> None:
    """Surfer ASCII writer (surfer_ascii_raster.rs:141-145 header order);
    data bottom-to-top, executor-encoded row blocks."""
    zmin, zmax = _value_range(cells, 1.71041e38)
    with open(path, "wb") as f:
        f.write(b"DSAA\n")
        f.write(f"{meta.columns} {meta.rows}\n".encode())
        f.write(f"{meta.west!r} {meta.east!r}\n".encode())
        f.write(f"{meta.south!r} {meta.north!r}\n".encode())
        f.write(f"{zmin!r} {zmax!r}\n".encode())
        for _b, payload in _encoded_row_blocks(cells, meta, _ascii_rows_encode,
                                               1.71041e38, reverse=True):
            f.write(payload)


def read_grass_ascii(spark: SparkSession, path: str) -> tuple[DataFrame, GridMeta]:
    """GRASS ASCII raster (grass_raster.rs:36-39 header keys
    north/south/east/west/rows/cols, data north-first)."""
    lines = spark.sparkContext.textFile(path).zipWithIndex().toDF(["line", "idx"])
    lines = lines.persist()
    hdr_rows = sorted(lines.where("idx < 6").collect(), key=lambda r: r["idx"])
    hdr: dict[str, float] = {}
    for r in hdr_rows:
        parts = r["line"].replace(":", " ").split()
        if len(parts) >= 2:
            hdr[parts[0].lower()] = float(parts[1])
    nrows, ncols = int(hdr["rows"]), int(hdr["cols"])
    meta = GridMeta(rows=nrows, columns=ncols, north=hdr["north"],
                    south=hdr["south"], east=hdr["east"], west=hdr["west"],
                    resolution_x=(hdr["east"] - hdr["west"]) / ncols,
                    resolution_y=(hdr["north"] - hdr["south"]) / nrows)
    cells = (
        lines.where("idx >= 6")
        .selectExpr("idx - 6 AS row",
                    "POSEXPLODE(SPLIT(TRIM(line), '\\\\s+')) AS (col, sval)")
        .selectExpr("row", "CAST(col AS BIGINT) AS col", "CAST(sval AS DOUBLE) AS value")
    )
    lines.unpersist()
    return cells, meta


def write_grass_ascii(cells: DataFrame, meta: GridMeta, path: str) -> None:
    with open(path, "wb") as f:
        f.write(f"north: {meta.north!r}\n".encode())
        f.write(f"south: {meta.south!r}\n".encode())
        f.write(f"east: {meta.east!r}\n".encode())
        f.write(f"west: {meta.west!r}\n".encode())
        f.write(f"rows: {meta.rows}\n".encode())
        f.write(f"cols: {meta.columns}\n".encode())
        for _b, payload in _encoded_row_blocks(cells, meta, _ascii_rows_encode,
                                               meta.nodata):
            f.write(payload)


_WB_DTYPES = {"double": ("<f8", "DOUBLE"), "float": ("<f4", "FLOAT"),
              "i16": ("<i2", "I16"), "byte": ("u1", "BYTE")}


def write_whitebox(cells: DataFrame, meta: GridMeta, base_path: str,
                   data_type: str = "float") -> None:
    """Whitebox native raster (.dep text header + .tas raw little-endian
    row-major data; whitebox_raster.rs:118-140,293). base_path without
    extension."""
    np_dt, label = _WB_DTYPES[data_type]
    zmin, zmax = _value_range(cells, meta.nodata)
    with open(base_path + ".dep", "w") as f:
        f.write(f"Min:\t{zmin!r}\n")
        f.write(f"Max:\t{zmax!r}\n")
        f.write(f"North:\t{meta.north!r}\n")
        f.write(f"South:\t{meta.south!r}\n")
        f.write(f"East:\t{meta.east!r}\n")
        f.write(f"West:\t{meta.west!r}\n")
        f.write(f"Cols:\t{meta.columns}\n")
        f.write(f"Rows:\t{meta.rows}\n")
        f.write(f"Data Type:\t{label}\n")
        f.write("Data Scale:\tcontinuous\n")
        f.write(f"Preferred Palette:\tgrey.plt\n")
        f.write(f"NoData:\t{meta.nodata!r}\n")
        f.write("Byte Order:\tLITTLE_ENDIAN\n")
    with open(base_path + ".tas", "wb") as f:
        for _b, payload in _encoded_row_blocks(
                cells, meta, lambda g: g.astype(np_dt).tobytes(), meta.nodata):
            f.write(payload)


def read_whitebox(spark: SparkSession, base_path: str) -> tuple[DataFrame, GridMeta]:
    """Whitebox native raster reader (header keys whitebox_raster.rs:39-90)."""
    hdr: dict[str, str] = {}
    with open(base_path + ".dep") as f:
        for line in f:
            if ":" in line:
                k, v = line.split(":", 1)
                hdr[k.strip().lower()] = v.strip()
    nrows, ncols = int(hdr["rows"]), int(hdr["cols"])
    north, south = float(hdr["north"]), float(hdr["south"])
    east, west = float(hdr["east"]), float(hdr["west"])
    nodata = float(hdr.get("nodata", "-32768"))
    label = hdr.get("data type", "FLOAT").lower()
    np_dt = {"double": "<f8", "float": "<f4", "i16": "<i2",
             "byte": "u1"}[label]
    meta = GridMeta(rows=nrows, columns=ncols, north=north, south=south,
                    east=east, west=west,
                    resolution_x=(east - west) / ncols,
                    resolution_y=(north - south) / nrows, nodata=nodata)
    binary = spark.read.format("binaryFile").load(base_path + ".tas")
    schema = StructType([StructField("row", LongType()), StructField("col", LongType()),
                         StructField("value", DoubleType())])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for _, rec in b.iterrows():
                arr = np.frombuffer(rec["content"], dtype=np_dt).astype(np.float64)
                rows, cols = np.divmod(np.arange(arr.size, dtype=np.int64), ncols)
                yield pd.DataFrame({"row": rows, "col": cols, "value": arr})

    return binary.mapInPandas(decode, schema), meta


def write_idrisi(cells: DataFrame, meta: GridMeta, base_path: str) -> None:
    """Idrisi raster (.rdc text header + .rst binary f32 row-major
    north-first; idrisi_raster.rs:64-152,270-311)."""
    zmin, zmax = _value_range(cells, meta.nodata)
    with open(base_path + ".rdc", "w") as f:
        f.write("file format : IDRISI Raster A.1\n")
        f.write("file type   : binary\n")
        f.write(f"columns     : {meta.columns}\n")
        f.write(f"rows        : {meta.rows}\n")
        f.write("data type   : real\n")
        f.write(f"min. X      : {meta.west!r}\n")
        f.write(f"max. X      : {meta.east!r}\n")
        f.write(f"min. Y      : {meta.south!r}\n")
        f.write(f"max. Y      : {meta.north!r}\n")
        f.write(f"display min : {zmin!r}\n")
        f.write(f"display max : {zmax!r}\n")
        f.write(f"flag value  : {meta.nodata!r}\n")
    with open(base_path + ".rst", "wb") as f:
        for _b, payload in _encoded_row_blocks(
                cells, meta, lambda g: g.astype("<f4").tobytes(), meta.nodata):
            f.write(payload)


def read_idrisi(spark: SparkSession, base_path: str) -> tuple[DataFrame, GridMeta]:
    hdr: dict[str, str] = {}
    with open(base_path + ".rdc") as f:
        for line in f:
            if ":" in line:
                k, v = line.split(":", 1)
                hdr[k.strip().lower()] = v.strip()
    nrows, ncols = int(hdr["rows"]), int(hdr["columns"])
    west, east = float(hdr["min. x"]), float(hdr["max. x"])
    south, north = float(hdr["min. y"]), float(hdr["max. y"])
    nodata = float(hdr.get("flag value", "-32768"))
    meta = GridMeta(rows=nrows, columns=ncols, north=north, south=south,
                    east=east, west=west,
                    resolution_x=(east - west) / ncols,
                    resolution_y=(north - south) / nrows, nodata=nodata)
    binary = spark.read.format("binaryFile").load(base_path + ".rst")
    schema = StructType([StructField("row", LongType()), StructField("col", LongType()),
                         StructField("value", DoubleType())])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for _, rec in b.iterrows():
                arr = np.frombuffer(rec["content"], dtype="<f4").astype(np.float64)
                rows, cols = np.divmod(np.arange(arr.size, dtype=np.int64), ncols)
                yield pd.DataFrame({"row": rows, "col": cols, "value": arr})

    return binary.mapInPandas(decode, schema), meta


def write_esri_float(cells: DataFrame, meta: GridMeta, base_path: str) -> None:
    """ESRI binary float grid (.flt + .hdr; arcbinary_raster.rs):
    little-endian f32, row-major from the north."""
    with open(base_path + ".hdr", "w") as f:
        f.write(f"NCOLS {meta.columns}\n")
        f.write(f"NROWS {meta.rows}\n")
        f.write(f"XLLCORNER {meta.west!r}\n")
        f.write(f"YLLCORNER {meta.south!r}\n")
        f.write(f"CELLSIZE {meta.resolution_x!r}\n")
        f.write(f"NODATA_VALUE {meta.nodata!r}\n")
        f.write("BYTEORDER LSBFIRST\n")
    with open(base_path + ".flt", "wb") as f:
        for _b, payload in _encoded_row_blocks(
                cells, meta, lambda g: g.astype("<f4").tobytes(), meta.nodata):
            f.write(payload)


def read_esri_float(spark: SparkSession, base_path: str) -> tuple[DataFrame, GridMeta]:
    hdr: dict[str, str] = {}
    with open(base_path + ".hdr") as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                hdr[parts[0].lower()] = parts[1]
    nrows, ncols = int(hdr["nrows"]), int(hdr["ncols"])
    cellsize = float(hdr["cellsize"])
    west, south = float(hdr["xllcorner"]), float(hdr["yllcorner"])
    nodata = float(hdr.get("nodata_value", "-32768"))
    meta = GridMeta(rows=nrows, columns=ncols, north=south + nrows * cellsize,
                    south=south, east=west + ncols * cellsize, west=west,
                    resolution_x=cellsize, resolution_y=cellsize, nodata=nodata)
    binary = spark.read.format("binaryFile").load(base_path + ".flt")
    schema = StructType([StructField("row", LongType()), StructField("col", LongType()),
                         StructField("value", DoubleType())])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for _, rec in b.iterrows():
                arr = np.frombuffer(rec["content"], dtype="<f4").astype(np.float64)
                rows, cols = np.divmod(np.arange(arr.size, dtype=np.int64), ncols)
                yield pd.DataFrame({"row": rows, "col": cols, "value": arr})

    return binary.mapInPandas(decode, schema), meta


# ---------------------------------------------------------------------------
# Surfer 7 binary grid (.grd DSRB) and SAGA (.sgrd/.sdat)
# (whitebox-raster/src/surfer7_raster.rs, saga_raster.rs)
# ---------------------------------------------------------------------------

_SURFER7_BLANK = 1.71041e38


def _surfer7_sections(buf: bytes) -> tuple[GridMeta, int]:
    """Walk the Surfer 7 tagged-section stream ([tag:i32][size:i32][payload])
    and return (GridMeta from the GRID section, byte offset of the DATA
    payload). Tolerates extra or reordered sections between GRID and DATA
    instead of assuming the fixed 12+8+72+8 layout."""
    if struct.unpack_from("<i", buf, 0)[0] != 0x42525344:
        raise ValueError("not a Surfer 7 grid (DSRB header missing)")
    ver_size = struct.unpack_from("<i", buf, 4)[0]
    pos = 8 + ver_size
    meta = None
    data_off = None
    while pos + 8 <= len(buf):
        tag, size = struct.unpack_from("<2i", buf, pos)
        pos += 8
        if tag == 0x44495247:  # GRID
            rows, cols = struct.unpack_from("<2i", buf, pos)
            west, south, resx, resy = struct.unpack_from("<4d", buf, pos + 8)
            # east/north derived as the reference does (surfer7_raster.rs:
            # 181-182, note it uses resolution_x for the north extent too)
            meta = GridMeta(rows=rows, columns=cols,
                            north=south + resx * rows, south=south,
                            east=west + resx * cols, west=west,
                            resolution_x=resx, resolution_y=resy,
                            nodata=_SURFER7_BLANK)
        elif tag == 0x41544144:  # DATA
            data_off = pos
            break  # DATA payload length = rows*cols*8; nothing follows it
        pos += size
    if meta is None:
        raise ValueError("Surfer 7 GRID section missing")
    if data_off is None:
        raise ValueError("Surfer 7 DATA section missing")
    return meta, data_off


def _surfer7_meta(buf: bytes) -> GridMeta:
    return _surfer7_sections(buf)[0]


def read_surfer7(spark: SparkSession, path: str) -> tuple[DataFrame, GridMeta]:
    """Surfer 7 binary grid (surfer7_raster.rs layout: DSRB/GRID/DATA
    sections, f64 values bottom-to-top row-major). Executor-side
    decode (binaryFile + mapInPandas)."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    head = files.orderBy("path").limit(1).collect()
    if not head:
        raise ValueError(f"no Surfer 7 files at {path}")
    meta = _surfer7_meta(bytes(head[0]["content"]))
    rows_n, cols_n = meta.rows, meta.columns

    schema = StructType([
        StructField("row", LongType(), False),
        StructField("col", LongType(), False),
        StructField("value", DoubleType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, r in pdf.iterrows():
                buf = bytes(r["content"])
                fmeta, data_off = _surfer7_sections(buf)
                if (fmeta.rows, fmeta.columns) != (rows_n, cols_n):
                    raise ValueError(
                        f"Surfer 7 file {r['path']} grid is "
                        f"{fmeta.rows}x{fmeta.columns}, expected "
                        f"{rows_n}x{cols_n} from the schema file")
                vals = np.frombuffer(buf, dtype="<f8", count=rows_n * cols_n,
                                     offset=data_off).reshape(rows_n, cols_n)
                grid = vals[::-1]  # file is bottom-to-top
                rr, cc = np.meshgrid(np.arange(rows_n), np.arange(cols_n),
                                     indexing="ij")
                yield pd.DataFrame({
                    "row": rr.ravel().astype(np.int64),
                    "col": cc.ravel().astype(np.int64),
                    "value": grid.ravel().astype(np.float64),
                })

    return files.mapInPandas(run, schema=schema), meta


def write_surfer7(cells: DataFrame, meta: GridMeta, path: str) -> None:
    """Surfer 7 binary writer (surfer7_raster.rs:332-380 section
    order); bottom-up data streamed as executor-encoded row blocks."""
    zmin, zmax = _value_range(cells, _SURFER7_BLANK)
    with open(path, "wb") as f:
        f.write(struct.pack("<iii", 0x42525344, 4, 2))
        f.write(struct.pack("<ii", 0x44495247, 72))
        f.write(struct.pack("<2i", meta.rows, meta.columns))
        f.write(struct.pack("<4d", meta.west, meta.south,
                            meta.resolution_x, meta.resolution_y))
        f.write(struct.pack("<4d", zmin, zmax, 0.0, _SURFER7_BLANK))
        f.write(struct.pack("<ii", 0x41544144, meta.rows * meta.columns * 8))
        for _b, payload in _encoded_row_blocks(
                cells, meta, lambda g: g.astype("<f8").tobytes(),
                _SURFER7_BLANK, reverse=True):
            f.write(payload)


def read_saga(spark: SparkSession, base_path: str) -> tuple[DataFrame, GridMeta]:
    """SAGA grid (saga_raster.rs): .sgrd text header + .sdat raw data,
    TOPTOBOTTOM=FALSE -> bottom-up row order. DOUBLE/FLOAT formats."""
    hdr: dict[str, str] = {}
    with open(base_path + ".sgrd") as f:
        for line in f:
            if "=" in line:
                k, v = line.split("=", 1)
                hdr[k.strip().upper()] = v.strip()
    cols_n = int(hdr["CELLCOUNT_X"])
    rows_n = int(hdr["CELLCOUNT_Y"])
    cell = float(hdr["CELLSIZE"])
    west = float(hdr["POSITION_XMIN"]) - 0.5 * cell
    south = float(hdr["POSITION_YMIN"]) - 0.5 * cell
    nodata = float(hdr.get("NODATA_VALUE", "-99999"))
    fmt = hdr.get("DATAFORMAT", "DOUBLE").upper()
    dt = "<f8" if fmt == "DOUBLE" else "<f4"
    top2bot = hdr.get("TOPTOBOTTOM", "FALSE").upper() == "TRUE"
    meta = GridMeta(rows=rows_n, columns=cols_n,
                    north=south + cell * rows_n, south=south,
                    east=west + cell * cols_n, west=west,
                    resolution_x=cell, resolution_y=cell, nodata=nodata)
    files = spark.read.format("binaryFile").load(base_path + ".sdat") \
        .select("content")

    schema = StructType([
        StructField("row", LongType(), False),
        StructField("col", LongType(), False),
        StructField("value", DoubleType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, r in pdf.iterrows():
                vals = np.frombuffer(bytes(r["content"]), dtype=dt,
                                     count=rows_n * cols_n).reshape(rows_n, cols_n)
                grid = vals if top2bot else vals[::-1]
                rr, cc = np.meshgrid(np.arange(rows_n), np.arange(cols_n),
                                     indexing="ij")
                yield pd.DataFrame({
                    "row": rr.ravel().astype(np.int64),
                    "col": cc.ravel().astype(np.int64),
                    "value": grid.ravel().astype(np.float64),
                })

    return files.mapInPandas(run, schema=schema), meta


def write_saga(cells: DataFrame, meta: GridMeta, base_path: str,
               data_format: str = "DOUBLE") -> None:
    """SAGA writer (saga_raster.rs:441-540 header keys,
    TOPTOBOTTOM=FALSE bottom-up data)."""
    with open(base_path + ".sgrd", "w") as f:
        f.write(f"NAME\t= {base_path.rsplit('/', 1)[-1]}\n")
        f.write("DESCRIPTION\t= \n")
        f.write("DATAFILE_OFFSET\t= 0\n")
        f.write(f"DATAFORMAT\t= {data_format}\n")
        f.write("BYTEORDER_BIG\t= FALSE\n")
        f.write(f"POSITION_XMIN\t= {meta.west + 0.5 * meta.resolution_x!r}\n")
        f.write(f"POSITION_YMIN\t= {meta.south + 0.5 * meta.resolution_y!r}\n")
        f.write(f"CELLCOUNT_X\t= {meta.columns}\n")
        f.write(f"CELLCOUNT_Y\t= {meta.rows}\n")
        f.write(f"CELLSIZE\t= {meta.resolution_x!r}\n")
        f.write("Z_FACTOR\t= 1.000000\n")
        f.write(f"NODATA_VALUE\t= {meta.nodata!r}\n")
        f.write("TOPTOBOTTOM\t= FALSE\n")
    dt = "<f8" if data_format.upper() == "DOUBLE" else "<f4"
    with open(base_path + ".sdat", "wb") as f:
        for _b, payload in _encoded_row_blocks(
                cells, meta, lambda g: g.astype(dt).tobytes(), meta.nodata,
                reverse=True):
            f.write(payload)


# ---------------------------------------------------------------------------
# ESRI BIL (.bil + .hdr; whitebox-raster/src/esri_bil.rs) — the last of
# the reference's 10 raster formats. Single-band BIL is a plain
# row-major binary grid; the header carries pixel type / bit depth /
# byte order and CENTER-of-upper-left-cell georeferencing (ULXMAP /
# ULYMAP; esri_bil.rs:113-116).
# ---------------------------------------------------------------------------

_BIL_DTYPES = {
    ("float", 32): "f4", ("float", 64): "f8",
    ("signedint", 8): "i1", ("signedint", 16): "i2", ("signedint", 32): "i4",
    ("unsignedint", 8): "u1", ("unsignedint", 16): "u2",
    ("unsignedint", 32): "u4",
}


def write_esri_bil(cells: DataFrame, meta: GridMeta, base_path: str,
                   pixel_type: str = "FLOAT", nbits: int = 32) -> None:
    """ESRI BIL writer (esri_bil.rs:440-662 header keys: BYTEORDER I =
    little-endian, LAYOUT BIL, ULXMAP/ULYMAP are the CENTER of the
    upper-left cell). Row blocks densified + encoded executor-side."""
    key = (pixel_type.lower(), nbits)
    if key not in _BIL_DTYPES:
        raise ValueError(f"unsupported BIL pixel type {pixel_type}/{nbits}")
    np_dt = "<" + _BIL_DTYPES[key]
    if pixel_type.lower() != "float":
        # integer output: the nodata fill is astype-ed into the target
        # dtype; a non-representable sentinel (e.g. -32768 into u2) would
        # silently wrap to a garbage in-range value while the .hdr still
        # advertises the original NODATA — refuse instead.
        info = np.iinfo(np.dtype(_BIL_DTYPES[key]))
        if not (info.min <= meta.nodata <= info.max
                and float(meta.nodata).is_integer()):
            raise ValueError(
                f"nodata {meta.nodata!r} is not representable in BIL "
                f"{pixel_type}/{nbits} (range [{info.min}, {info.max}]); "
                f"set GridMeta.nodata to an in-range integer sentinel")
    with open(base_path + ".hdr", "w") as f:
        f.write("BYTEORDER      I\n")
        f.write("LAYOUT         BIL\n")
        f.write(f"NROWS          {meta.rows}\n")
        f.write(f"NCOLS          {meta.columns}\n")
        f.write("NBANDS         1\n")
        f.write(f"NBITS          {nbits}\n")
        f.write(f"BANDROWBYTES   {nbits // 8 * meta.columns}\n")
        f.write(f"TOTALROWBYTES  {nbits // 8 * meta.columns}\n")
        f.write(f"PIXELTYPE      {pixel_type.upper()}\n")
        f.write(f"ULXMAP         {meta.west + meta.resolution_x / 2.0!r}\n")
        f.write(f"ULYMAP         {meta.north - meta.resolution_y / 2.0!r}\n")
        f.write(f"XDIM           {meta.resolution_x!r}\n")
        f.write(f"YDIM           {meta.resolution_y!r}\n")
        f.write(f"NODATA         {meta.nodata!r}\n")
    with open(base_path + ".bil", "wb") as f:
        for _b, payload in _encoded_row_blocks(
                cells, meta, lambda g: g.astype(np_dt).tobytes(), meta.nodata):
            f.write(payload)


def read_esri_bil(spark: SparkSession, base_path: str) -> tuple[DataFrame, GridMeta]:
    """ESRI BIL reader (esri_bil.rs:20-150): header keys are
    first-token-prefix matched case-insensitively, BYTEORDER containing
    'i' means little-endian, extents derived from cell-center ULXMAP /
    ULYMAP (esri_bil.rs:113-116). Only single-band BIL layout is
    supported, matching the reference's warning for BSQ/BIP."""
    hdr: dict[str, str] = {}
    with open(base_path + ".hdr") as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                hdr[parts[0].lower()] = parts[1].lower()
    if int(float(hdr.get("nbands", "1"))) != 1:
        raise ValueError("only single-band BIL is supported")
    nrows, ncols = int(float(hdr["nrows"])), int(float(hdr["ncols"]))
    nbits = int(float(hdr.get("nbits", "32")))
    pixel_type = hdr.get("pixeltype", "float")
    endian = "<" if "i" in hdr.get("byteorder", "i") else ">"
    resx = float(hdr.get("xdim", "1"))
    resy = float(hdr.get("ydim", "1"))
    ulx, uly = float(hdr["ulxmap"]), float(hdr["ulymap"])
    nodata = float(hdr.get("nodata", "-32768"))
    north = uly + resy / 2.0
    west = ulx - resx / 2.0
    meta = GridMeta(rows=nrows, columns=ncols, north=north,
                    south=north - resy * nrows, east=west + resx * ncols,
                    west=west, resolution_x=resx, resolution_y=resy,
                    nodata=nodata)
    key = (pixel_type, nbits)
    if key not in _BIL_DTYPES:
        raise ValueError(f"unsupported BIL pixel type {pixel_type}/{nbits}")
    np_dt = endian + _BIL_DTYPES[key]
    binary = spark.read.format("binaryFile").load(base_path + ".bil")
    schema = StructType([StructField("row", LongType()), StructField("col", LongType()),
                         StructField("value", DoubleType())])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for _, rec in b.iterrows():
                arr = np.frombuffer(rec["content"], dtype=np_dt).astype(np.float64)
                rows, cols = np.divmod(np.arange(arr.size, dtype=np.int64), ncols)
                yield pd.DataFrame({"row": rows, "col": cols, "value": arr})

    return binary.mapInPandas(decode, schema), meta


def write_shapefile_tiles(features: DataFrame, out_dir: str,
                          tile_col: str = "tile_id",
                          shape_type: int = 5,
                          id_col: str = "shape_id") -> DataFrame:
    """Distributed vector egress: one .shp/.shx/.dbf per tile, encoded
    and written inside the executors (the write_lidar_tiles pattern for
    feature layers — real shapefile archives are tiled by sheet, so
    egress parallelism == tile count and no geometry crosses the
    driver). Returns the (tile, path, n_features) manifest.

    features: (id_col, parts array<struct<part_idx, is_hole,
    ring array<struct<x, y>>>>, tile_col); features are ordered by
    id_col within each tile for deterministic files."""
    import os as _os

    _os.makedirs(out_dir, exist_ok=True)

    def write_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        tile = pdf[tile_col].iloc[0]
        pdf = pdf.sort_values(id_col)
        feats = []
        for _, rec in pdf.iterrows():
            feats.append({
                "record_num": int(rec[id_col]),
                "parts": [(bool(p["is_hole"]),
                           [(v["x"], v["y"]) for v in p["ring"]])
                          for p in rec["parts"]],
                "attrs": {"FID": int(rec[id_col])},
            })
        path = _os.path.join(out_dir, f"tile_{tile}.shp")
        write_shapefile(feats, path, shape_type=shape_type)
        return pd.DataFrame({"tile": [tile], "path": [path],
                             "n_features": [len(feats)]})

    return features.groupBy(tile_col).applyInPandas(
        write_tile, "tile long, path string, n_features long")
