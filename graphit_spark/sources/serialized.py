"""GAPBS serialized-graph (.sg / .wsg) source and sink.

Reference layout (src/runtime_lib/infra_gapbs/reader.h:322-374
ReadSerializedGraph, writer.h:39-69 WriteSerializedGraph), all
little-endian:

    bool   directed                  (1 byte)
    int64  num_edges                 (directed edge count as stored)
    int64  num_nodes
    int64  offsets[num_nodes + 1]    (out-CSR index)
    .sg  : int32 neighbor[num_edges]
    .wsg : {int32 neighbor, int32 weight}[num_edges]
    if directed: the same offsets+neighbors pair again for the in-CSR
    (the transpose — redundant for an edge-table engine, skipped on
    read, written on write for format compliance).

The stored graph is already built (squished: deduped, self-loop-free,
sorted neighbors), so LinkGraph construction passes ``squished=True``;
the vertex universe comes from the header's ``num_nodes`` (trailing
isolated vertices carry no edges, so the id-derived universe would
undercount them).

Scale note: like .mtx/.graph this is a small-TEST-graph format — one
file parses in one task (binaryFile row → mapInPandas over the whole
byte string). The at-scale interchange format is Parquet.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession

HEADER_FMT = "<?qq"  # directed, num_edges, num_nodes
HEADER_LEN = struct.calcsize(HEADER_FMT)


def _decode_edges(content: bytes, weighted: bool):
    """bytes → (src int64[], dst int64[], weight int64[] | None)."""
    directed, num_edges, num_nodes = struct.unpack_from(HEADER_FMT, content, 0)
    off = HEADER_LEN
    offsets = np.frombuffer(content, "<i8", num_nodes + 1, off)
    off += 8 * (num_nodes + 1)
    src = np.repeat(
        np.arange(num_nodes, dtype=np.int64), np.diff(offsets)
    )
    if weighted:
        pairs = np.frombuffer(content, "<i4", num_edges * 2, off)
        return src, pairs[0::2].astype(np.int64), pairs[1::2].astype(np.int64)
    nbrs = np.frombuffer(content, "<i4", num_edges, off)
    return src, nbrs.astype(np.int64), None


def _read(spark: SparkSession, path: str, weighted: bool) -> DataFrame:
    files = spark.read.format("binaryFile").load(path).select("content")
    schema = "src long, dst long" + (", weight long" if weighted else "")

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            for content in pdf["content"]:
                s, d, w = _decode_edges(bytes(content), weighted)
                cols = {"src": s, "dst": d}
                if weighted:
                    cols["weight"] = w
                yield pd.DataFrame(cols)

    return files.mapInPandas(parse, schema)


def read_sg(spark: SparkSession, path: str) -> DataFrame:
    """.sg → (src, dst) from the out-CSR."""
    return _read(spark, path, weighted=False)


def read_wsg(spark: SparkSession, path: str) -> DataFrame:
    """.wsg → (src, dst, weight) from the out-CSR."""
    return _read(spark, path, weighted=True)


def read_header(spark: SparkSession, path: str):
    """(directed, num_edges, num_nodes) without shipping the payload to
    the driver — slices the 17 header bytes JVM-side."""
    from pyspark.sql import functions as F

    row = (
        spark.read.format("binaryFile")
        .load(path)
        .select(F.expr(f"substring(content, 1, {HEADER_LEN})").alias("h"))
        .collect()[0]
    )
    return struct.unpack(HEADER_FMT, bytes(row["h"]))


def load_sg_graph(spark: SparkSession, path: str):
    """.sg/.wsg → LinkGraph with the header-defined vertex universe
    (CSRGraph::num_nodes — a trailing isolated vertex exists even though
    no edge names it)."""
    from graphit_spark.graph import LinkGraph

    weighted = path.endswith(".wsg")
    _, _, num_nodes = read_header(spark, path)
    edges = read_wsg(spark, path) if weighted else read_sg(spark, path)
    return LinkGraph(edges, squished=True, num_vertices=num_nodes)


def write_sg(graph, path: str) -> None:
    """LinkGraph → .sg/.wsg (suffix decides; driver-side CSR assembly —
    a test-format sink, mirroring writer.h:39-69 including the in-CSR
    block the reference appends for directed graphs)."""
    weighted = path.endswith(".wsg")
    if weighted and not graph.weighted:
        raise ValueError(".wsg requires a weighted graph")
    if not weighted and graph.weighted:
        raise ValueError(".sg cannot store weights — use .wsg")
    n = graph.num_vertices
    rows = graph.edges.orderBy("src", "dst").collect()

    def csr(pairs):
        counts = np.zeros(n + 1, dtype=np.int64)
        for s, *_ in pairs:
            counts[s + 1] += 1
        offsets = np.cumsum(counts)
        return offsets

    out = [(r["src"], r["dst"], r["weight"] if weighted else 0) for r in rows]
    inn = sorted((d, s, w) for s, d, w in out)
    with open(path, "wb") as f:
        f.write(struct.pack(HEADER_FMT, True, len(out), n))
        for block in (out, inn):
            f.write(csr(block).astype("<i8").tobytes())
            arr = np.empty(
                len(block) * (2 if weighted else 1), dtype="<i4"
            )
            if weighted:
                arr[0::2] = [d for _, d, _ in block]
                arr[1::2] = [w for _, _, w in block]
            else:
                arr[:] = [d for _, d, _ in block]
            f.write(arr.tobytes())


ASTAR_MAGIC = 0x150842A7
EARTH_RADIUS_CM = 637100000.0


def read_bin(spark: SparkSession, path: str):
    """GAPBS/GraphIt A* road-network ``.bin`` (reader.h:220-277
    ReadInAstar): magic, node count, then per node (lat, lon) doubles,
    neighbor-id u32 block, and great-circle edge lengths (radians ×
    EARTH_RADIUS_CM, truncated to integral weights exactly like the
    reference's WeightT assignment). Returns (edges_df, coords_df) —
    the coordinates feed the A* haversine heuristic
    (apps/astar_distance_loader.cpp). Small-test-format: one file
    parses in one task."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def parse_edges(batches):
        import pandas as pd

        for pdf in batches:
            for content in pdf["content"]:
                s, d, w, _ = _decode_astar(bytes(content))
                yield pd.DataFrame({"src": s, "dst": d, "weight": w})

    def parse_coords(batches):
        import pandas as pd

        for pdf in batches:
            for content in pdf["content"]:
                _, _, _, coords = _decode_astar(bytes(content))
                yield pd.DataFrame(
                    {"id": coords[0], "lat": coords[1], "lon": coords[2]}
                )

    edges = files.mapInPandas(
        parse_edges, "src long, dst long, weight long"
    )
    coords = files.mapInPandas(
        parse_coords, "id long, lat double, lon double"
    )
    return edges, coords


def _decode_astar(content: bytes):
    import numpy as np

    magic, num_nodes = struct.unpack_from("<II", content, 0)
    if magic != ASTAR_MAGIC:
        raise ValueError("Cannot read astar graph: magic mismatch")
    off = 8
    srcs, dsts, ws = [], [], []
    ids = np.arange(num_nodes, dtype=np.int64)
    lats = np.empty(num_nodes)
    lons = np.empty(num_nodes)
    for u in range(num_nodes):
        lats[u], lons[u] = struct.unpack_from("<dd", content, off)
        off += 16
        (deg,) = struct.unpack_from("<I", content, off)
        off += 4
        nbrs = np.frombuffer(content, "<u4", deg, off)
        off += 4 * deg
        dists = np.frombuffer(content, "<f8", deg, off)
        off += 8 * deg
        srcs.append(nbrs.astype(np.int64))
        dsts.append(np.full(deg, u, dtype=np.int64))
        # double -> integral WeightT truncates toward zero (C++ rules)
        ws.append((dists * EARTH_RADIUS_CM).astype(np.int64))
    # note the reference builds Edge(u, neighbor): u is the SOURCE
    src = np.concatenate(dsts) if dsts else np.array([], dtype=np.int64)
    dst = np.concatenate(srcs) if srcs else np.array([], dtype=np.int64)
    w = np.concatenate(ws) if ws else np.array([], dtype=np.int64)
    return src, dst, w, (ids, lats, lons)
