"""Multimodal binary-column operators: oracle checks + plumbing goldens."""

from __future__ import annotations

import pytest

from guagua_spark.operators.multimodal import (
    FRAME_STEP,
    ORACLE_SQL,
    QUERIES,
    _decode,
    _dims,
    _encode,
    decode_with_real_codec,
    media_assets,
)

from oracle import assert_matches_oracle, duck_connection


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    con = duck_connection(oracle_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_multimodal_matches_oracle(spark, oracle_sf_dir, duck, name):
    df = QUERIES[name](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, ORACLE_SQL[name], rtol=1e-6)


def test_fake_codec_roundtrip():
    for doc_id in (0, 1, 7, 123, 4999):
        w, h, nf, px = _decode(_encode(doc_id))
        ew, eh, enf, enb = _dims(doc_id)
        assert (w, h, nf, len(px)) == (ew, eh, enf, enb)
        assert px[0] == (doc_id * 31) % 256


def test_assets_schema_and_metadata_consistent(spark, sf_dir):
    assets = media_assets(spark, sf_dir)
    assert [f.name for f in assets.schema.fields] == ["doc_id", "media", "meta"]
    assert dict(assets.dtypes)["media"] == "binary"
    # meta struct agrees with what the binary header says
    row = assets.filter("doc_id = 3").collect()[0]
    w, h, _, _ = _decode(bytes(row.media))
    assert (row.meta.width, row.meta.height) == (w, h)


def test_resize_deterministic_golden(spark, sf_dir):
    rows = (
        QUERIES["multimodal_resize"](spark, sf_dir)
        .filter("doc_id in (0, 1)")
        .collect()
    )
    want = []
    for doc_id in (0, 1):
        _, _, _, px = _decode(_encode(doc_id))
        idx = [j * (len(px) - 1) // 63 for j in range(64)]
        want.append(int(px[idx].sum()))
    assert [r.checksum for r in rows] == want
    assert all((r.width, r.height) == (8, 8) for r in rows)


def test_frame_sample_stride(spark, sf_dir):
    rows = QUERIES["multimodal_frame_sample"](spark, sf_dir).collect()
    assert all(r.frame_idx % FRAME_STEP == 0 for r in rows)


def test_real_codec_seam_is_marked():
    with pytest.raises(NotImplementedError):
        decode_with_real_codec(b"\x89PNG")
