"""MBTiles sink/source (sources/mbtiles.py): spec conformance (schema,
TMS row flip, metadata), sharded round-trip byte equality, idempotent
re-runs."""

import os
import sqlite3

import pytest

from mapnik_vector_tile_spark.sources import mbtiles as MB


@pytest.fixture()
def tile_rows():
    return [
        (2, 1, 0, b"\x1a\x03abc"),
        (2, 3, 2, b"\x1a\x01x"),
        (3, 5, 7, b"\x1a\x02yz"),
        (0, 0, 0, b"\x1a\x05world"),
    ]


def test_roundtrip_byte_exact(spark, tmp_path, tile_rows):
    df = spark.createDataFrame(
        [(z, x, y, bytearray(b)) for z, x, y, b in tile_rows],
        "z int, x long, y long, tile binary",
    )
    out = str(tmp_path / "shards")
    n = MB.write_mbtiles_shards(df, out, metadata={"name": "t"}, num_shards=3)
    assert n == 3
    back = {
        (r.z, r.x, r.y): bytes(r.tile)
        for r in MB.read_mbtiles(spark, out).collect()
    }
    assert back == {(z, x, y): b for z, x, y, b in tile_rows}


def test_spec_conformance_tms_flip(spark, tmp_path, tile_rows):
    """Open a shard with RAW sqlite3 (no engine code): spec tables
    exist and tile_row is TMS (2^z - 1 - y)."""
    df = spark.createDataFrame(
        [(z, x, y, bytearray(b)) for z, x, y, b in tile_rows],
        "z int, x long, y long, tile binary",
    )
    out = str(tmp_path / "shards")
    MB.write_mbtiles_shards(df, out, num_shards=1)
    shard = [f for f in os.listdir(out) if f.endswith(".mbtiles")]
    assert len(shard) == 1
    con = sqlite3.connect(os.path.join(out, shard[0]))
    try:
        names = {
            r[0]
            for r in con.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            )
        }
        assert {"metadata", "tiles"} <= names
        rows = con.execute(
            "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
        ).fetchall()
        got = {(z, x, (1 << z) - 1 - r): bytes(b) for z, x, r, b in rows}
        assert got == {(z, x, y): b for z, x, y, b in tile_rows}
        meta = dict(con.execute("SELECT name, value FROM metadata"))
        assert meta["format"] == "pbf" and meta["version"] == "1.3"
    finally:
        con.close()
    assert MB.read_metadata(out)["format"] == "pbf"


def test_rerun_is_idempotent(spark, tmp_path, tile_rows):
    df = spark.createDataFrame(
        [(z, x, y, bytearray(b)) for z, x, y, b in tile_rows],
        "z int, x long, y long, tile binary",
    )
    out = str(tmp_path / "shards")
    MB.write_mbtiles_shards(df, out, num_shards=2)
    first = {
        f: open(os.path.join(out, f), "rb").read()
        for f in sorted(os.listdir(out))
    }
    MB.write_mbtiles_shards(df, out, num_shards=2)
    second = {
        f: open(os.path.join(out, f), "rb").read()
        for f in sorted(os.listdir(out))
    }
    # byte-identical shard files across re-runs: same partitioning,
    # same in-shard row order, same metadata — full determinism
    assert first == second


def test_read_missing_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="no .mbtiles"):
        MB.read_mbtiles(spark, str(tmp_path))
