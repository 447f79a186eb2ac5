"""Contract test for the multimodal codec swap seam.

PIL/ffmpeg cannot be installed in this environment, so the decode step
ships as a deterministic stub (`plans.multimodal._fake_decode`). This
suite proves the documented one-function seam is real: injecting a
different "real-like" codec through ``decode_metadata(codec=...)``
requires ZERO plan changes — same schema, same partitioning (no
shuffle), same downstream frame_sample behavior — and the injected
codec actually sees the raw payload bytes on the workers.
"""

import pytest

from pyspark.sql import functions as F

from spark_fixtures import get_spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _make_codec():
    """Stand-in for a PIL/pyav decoder, built INSIDE the driver process:
    a nested function is cloudpickled by VALUE with the mapInPandas stage
    (a module-level test function would pickle by reference and fail on
    workers that don't have the test module on their path — exactly how a
    user would ship a real codec closure)."""

    def fake_real_codec(payload: bytes, media_type: str):
        checksum = sum(payload[:16]) if payload else 0
        if media_type == "image/png":
            return (1000 + checksum, 2000 + checksum, None, "pil")
        if media_type == "audio/wav":
            return (None, None, None, "soundfile")
        return (1920, 1080, 10 + checksum % 50, "pyav")

    return fake_real_codec


def test_codec_swap_needs_no_plan_changes(spark):
    from scotty_window_processor_spark.plans.multimodal import (
        attach_binary_payload,
        decode_metadata,
    )

    src = attach_binary_payload(_docs(spark))
    stub = decode_metadata(src)
    real = decode_metadata(src, codec=_make_codec())

    # identical schema and row set (one row per doc), no shuffle in either
    assert stub.schema == real.schema
    stub_plan = stub._jdf.queryExecution().executedPlan().toString()
    real_plan = real._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in stub_plan
    assert "Exchange" not in real_plan

    stub_rows = {r["doc_id"]: r for r in stub.collect()}
    real_rows = {r["doc_id"]: r for r in real.collect()}
    assert stub_rows.keys() == real_rows.keys()

    # the injected codec ran on the workers and saw the payload bytes
    some = next(iter(real_rows.values()))
    assert some["codec"] in {"pil", "soundfile", "pyav"}
    for doc_id, r in real_rows.items():
        assert r["byte_len"] == stub_rows[doc_id]["byte_len"]  # plumbing-side
        if r["codec"] == "pil":
            assert r["width"] >= 1000  # codec-derived, not stub-derived


def test_downstream_frame_sample_agnostic_to_codec(spark):
    from scotty_window_processor_spark.plans.multimodal import (
        attach_binary_payload,
        decode_metadata,
        frame_sample,
    )

    src = attach_binary_payload(_docs(spark))
    out = frame_sample(decode_metadata(src, codec=_make_codec()), every_n=5)
    rows = out.collect()
    assert rows, "no video rows sampled"
    # frame indices stride by every_n and stay under the codec's n_frames
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for idxs in by_doc.values():
        idxs.sort()
        assert idxs[0] == 0
        assert all(b - a == 5 for a, b in zip(idxs, idxs[1:]))


def test_resize_seam_and_contract(spark):
    """resize_images: image-only rows, no shuffle, and the resizer seam
    accepts a driver-built closure with zero plan changes."""
    from scotty_window_processor_spark.plans.multimodal import (
        attach_binary_payload,
        resize_images,
    )

    src = attach_binary_payload(_docs(spark))
    stub = resize_images(src, target_w=64, target_h=48)
    rows = stub.collect()
    n_images = src.where(F.col("media_type") == "image/png").count()
    assert len(rows) == n_images
    assert all(r["width"] == 64 and r["height"] == 48 for r in rows)
    assert "Exchange" not in stub._jdf.queryExecution().executedPlan().toString()

    def real_resizer(payload, media_type, w, h):
        return payload[::-1], w, h  # "re-encode" differently

    real = resize_images(src, target_w=64, target_h=48, resizer=real_resizer)
    assert real.schema == stub.schema
    a = {r["doc_id"]: bytes(r["resized"]) for r in rows}
    b = {r["doc_id"]: bytes(r["resized"]) for r in real.collect()}
    assert set(a) == set(b) and all(a[k] != b[k] for k in a if len(a[k]) > 1)


def test_extract_features_seam_and_contract(spark):
    """extract_features: one fixed-dim vector per row, deterministic stub,
    swap seam takes a driver-built extractor."""
    from scotty_window_processor_spark.plans.multimodal import (
        attach_binary_payload,
        extract_features,
    )

    src = attach_binary_payload(_docs(spark))
    out = extract_features(src, dim=8)
    rows = out.collect()
    assert len(rows) == src.count()
    assert all(len(r["features"]) == 8 for r in rows)
    assert all(0 <= v < 997 for r in rows for v in r["features"])
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()

    def real_extractor(payload, media_type, dim):
        return [len(payload) % (j + 2) for j in range(dim)]

    real = extract_features(src, dim=8, extractor=real_extractor)
    assert real.schema == out.schema
    r0 = {r["doc_id"]: list(r["features"]) for r in real.collect()}
    # the injected extractor's modulus bound proves it ran on the workers
    assert all(v[j] < j + 2 for v in r0.values() for j in range(8))


# round 5: opportunistic real-codec seam -----------------------------------

# a valid 1x1 red-pixel PNG (standard minimal encoding) — the golden
# vector for machines that DO have PIL; this container skips
_GOLDEN_PNG = bytes.fromhex(
    "89504e470d0a1a0a0000000d49484452000000010000000108020000009077"
    "53de0000000c4944415408d763f8cfc000000301010018dd8db00000000049"
    "454e44ae426082"
)


def test_auto_codec_falls_back_to_stub_without_libs():
    """Wherever the real libraries are absent, auto_codec/auto_resizer
    must hand back the deterministic stubs unchanged — the oracle path
    stays bit-identical on this container."""
    from scotty_window_processor_spark.plans import multimodal as mm

    if not (mm.HAVE_PIL or mm.HAVE_SOUNDFILE):
        assert mm.auto_codec() is mm._fake_decode
    if not mm.HAVE_PIL:
        assert mm.auto_resizer() is mm._fake_resize


def test_auto_codec_golden_png(spark):
    """Golden-vector contract for the REAL decoder: runs only where PIL
    exists (skipped in this container). The auto codec must decode the
    1x1 golden PNG to (1, 1, None, 'png') both directly and through the
    decode_metadata mapInPandas stage."""
    from scotty_window_processor_spark.plans import multimodal as mm

    if not mm.HAVE_PIL:
        import pytest as _pytest

        _pytest.skip("PIL not installed — real-codec golden test needs it")
    codec = mm.auto_codec()
    assert codec is not mm._fake_decode
    assert codec(_GOLDEN_PNG, "image/png") == (1, 1, None, "png")

    df = spark.createDataFrame(
        [(1, bytearray(_GOLDEN_PNG), "image/png")],
        "doc_id long, payload binary, media_type string",
    )
    row = mm.decode_metadata(df, codec=codec).collect()[0]
    assert (row["width"], row["height"], row["codec"]) == (1, 1, "png")
    out = mm.resize_images(df, target_w=2, target_h=2, resizer=mm.auto_resizer()).collect()[0]
    assert (out["width"], out["height"]) == (2, 2)
    assert codec(bytes(out["resized"]), "image/png")[:2] == (2, 2)
