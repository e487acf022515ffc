"""WebDataset tar shard sink/source (sources/wds.py): round-trip
equality on the input_hint-shaped images table, tar-level conformance
(pinned headers, basename grouping, member order), byte-deterministic
shards across re-runs, idempotent overwrite, foreign-tar read."""

import hashlib
import io
import json
import os
import tarfile

from mapnik_vector_tile_spark.sources import wds as WDS
from mapnik_vector_tile_spark.sources.synth import gen_images_pdf, images_df

N = 60


def _roundtrip(spark, out):
    imgs = images_df(spark, N)
    WDS.write_wds_shards(imgs, out, num_shards=4)
    back = {
        r.image_id: r for r in WDS.read_wds(spark, out).collect()
    }
    return imgs, back


def test_roundtrip_exact(spark, tmp_path):
    out = str(tmp_path / "shards")
    imgs, back = _roundtrip(spark, out)
    src = {r.image_id: r for r in imgs.collect()}
    assert set(back) == set(src)
    for k, o in src.items():
        r = back[k]
        assert bytes(r.bytes) == bytes(o.bytes)
        assert (r.w, r.h, r.fmt, r.caption, r.phash) == (
            o.w, o.h, o.fmt, o.caption, o.phash
        )


def test_tar_conformance_and_determinism(spark, tmp_path):
    """Open a shard with RAW tarfile (no engine code): members group
    by basename in (payload, json, txt) order, headers are pinned, the
    json replays the metadata columns — and a re-run writes the SAME
    bytes (deterministic files, idempotent overwrite)."""
    out = str(tmp_path / "shards")
    imgs = images_df(spark, N)
    WDS.write_wds_shards(imgs, out, num_shards=2)
    digests = {
        f: hashlib.sha256(
            open(os.path.join(out, f), "rb").read()
        ).hexdigest()
        for f in sorted(os.listdir(out))
    }
    assert len(digests) == 2

    pdf = gen_images_pdf(N).set_index("image_id")
    for f in digests:
        with tarfile.open(os.path.join(out, f)) as tf:
            members = tf.getmembers()
            assert members, f
            # groups of 3 members per sample, basenames sorted
            keys = []
            for i in range(0, len(members), 3):
                grp = members[i : i + 3]
                base = grp[0].name.split(".", 1)[0]
                keys.append(base)
                exts = [m.name.split(".", 1)[1] for m in grp]
                row = pdf.loc[base]
                assert exts == [row["fmt"], "json", "txt"]
                for m in grp:
                    assert (m.mtime, m.uid, m.gid, m.mode) == (0, 0, 0, 0o644)
                    assert (m.uname, m.gname) == ("", "")
                meta = json.loads(tf.extractfile(grp[1]).read())
                assert meta == {
                    "fmt": row["fmt"],
                    "h": int(row["h"]),
                    "phash": int(row["phash"]),
                    "w": int(row["w"]),
                }
                assert (
                    tf.extractfile(grp[0]).read() == bytes(row["bytes"])
                )
                assert (
                    tf.extractfile(grp[2]).read().decode() == row["caption"]
                )
            assert keys == sorted(keys)

    # re-run: byte-identical shards, no stale extras
    WDS.write_wds_shards(imgs, out, num_shards=2)
    again = {
        f: hashlib.sha256(
            open(os.path.join(out, f), "rb").read()
        ).hexdigest()
        for f in sorted(os.listdir(out))
    }
    assert again == digests

    # fewer shards on the re-run: stale part files are cleared
    WDS.write_wds_shards(imgs, out, num_shards=1)
    assert len([f for f in os.listdir(out) if f.endswith(".tar")]) == 1
    back = WDS.read_wds(spark, out)
    assert back.count() == N


def test_foreign_tar_read(spark, tmp_path):
    """A tar written by a foreign tool (plain tarfile, different member
    order within the convention) still reads back as samples."""
    p = str(tmp_path / "foreign.tar")
    with tarfile.open(p, "w") as tf:
        for key, payload, cap in [
            ("a001", b"\x01\x02", "first"),
            ("a002", b"\x03", "second"),
        ]:
            for name, data in [
                (f"{key}.bin", payload),
                (f"{key}.txt", cap.encode()),
            ]:
                ti = tarfile.TarInfo(name)
                ti.size = len(data)
                tf.addfile(ti, io.BytesIO(data))
    rows = {r.image_id: r for r in WDS.read_wds(spark, p).collect()}
    assert set(rows) == {"a001", "a002"}
    assert bytes(rows["a001"].bytes) == b"\x01\x02"
    assert rows["a001"].fmt == "bin"
    assert rows["a002"].caption == "second"
    # metadata absent in a foreign tar -> nulls, not a crash
    assert rows["a001"].w is None and rows["a001"].phash is None
