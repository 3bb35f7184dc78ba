"""Multimodal plumbing (operators/media.py) + IVF ANN recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ksana_corpus_builder_spark.operators import ann, media

SF = "/root/testdata/sf0.001"


def test_media_roundtrip(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    meta = media.decode_meta(media.synth_media(docs)).collect()
    assert len(meta) == 50
    for r in meta:
        assert r.fmt == "ksim"
        assert r.width == 16 + r.doc_id % 64
        assert r.height == 16 + r.doc_id % 48
        assert r.n_bytes == 12 + r.width * r.height
        assert r.kind in ("image", "audio", "video")


def test_media_unknown_container(spark):
    bad = spark.createDataFrame(
        [(1, "image", bytearray(b"JUNKxxxx"))],
        "doc_id long, kind string, payload binary")
    r = media.decode_meta(bad).collect()[0]
    assert r.fmt == "unknown" and r.width == 0 and r.n_bytes == 8


def test_byte_histogram_normalized(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    feats = media.byte_histogram(media.synth_media(docs)).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r.feat) == 16
        assert abs(sum(r.feat) - 1.0) < 1e-9


def test_decode_pixels_ksim_native(spark):
    """Real pixel decode of the native ksim container: per-image stats
    must equal a direct numpy re-derivation of the xor-pattern raster —
    no PIL needed (whole-batch Arrow-buffer decode)."""
    import numpy as np
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    rows = media.decode_pixels(media.synth_media(docs)).collect()
    assert len(rows) == 40
    for r in rows:
        w, h = 16 + r.doc_id % 64, 16 + r.doc_id % 48
        body = (np.arange(w * h, dtype=np.uint64)
                ^ np.uint64(r.doc_id)).astype(np.uint8)
        assert (r.fmt, r.width, r.height) == ("ksim", w, h)
        assert r.n_px == w * h
        assert r.px_sum == int(body.astype(np.int64).sum())
        assert (r.px_min, r.px_max) == (int(body.min()), int(body.max()))


def test_decode_pixels_unknown_container_no_crash(spark):
    """A non-ksim payload without PIL installed decodes to an
    'unsupported' zero-stats row — data-driven skip, not an exception."""
    import pandas as pd
    pdf = pd.DataFrame({"doc_id": [1], "kind": ["image"],
                        "payload": [b"\x89PNG not really a png"]})
    m = spark.createDataFrame(pdf)
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    rows = media.decode_pixels(m).collect()
    assert len(rows) == 1
    if not has_pil:
        assert rows[0].fmt == "unsupported" and rows[0].n_px == 0


@pytest.mark.skipif(
    not __import__("importlib").util.find_spec("PIL"),
    reason="PIL not installed in this container — the PNG/JPEG decode "
           "path is exercised when the driver supplies Pillow "
           "(mirrors the optional-Iceberg gating pattern)")
def test_decode_pixels_pil_png(spark):
    """With PIL present, a real PNG payload decodes through the PIL path
    with exact pixel stats."""
    import io

    import numpy as np
    import pandas as pd
    from PIL import Image
    a = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 251
    buf = io.BytesIO()
    Image.fromarray(a, mode="L").save(buf, format="PNG")
    pdf = pd.DataFrame({"doc_id": [42], "kind": ["image"],
                        "payload": [buf.getvalue()]})
    r = media.decode_pixels(spark.createDataFrame(pdf)).collect()[0]
    assert (r.fmt, r.width, r.height) == ("png", 8, 8)
    assert r.n_px == 64 and r.px_sum == int(a.astype(np.int64).sum())
    assert (r.px_min, r.px_max) == (int(a.min()), int(a.max()))


def test_ivf_recall_vs_brute_force(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [r[0] for r in
          e.where(F.col("vec_id") == 0).select(F.explode("embedding")).collect()]
    brute = {r.vec_id for r in ann.brute_force_topk(e, qv, k=10).collect()}
    ivf = {r.vec_id for r in
           ann.ivf_topk(e, qv, k=10, n_cells=16, n_probe=8).collect()}
    # probing half the cells must recover most of the true top-10
    assert len(brute & ivf) >= 5
    assert 0 in ivf  # the query vector itself lives in a probed cell


def test_ivf_kmeans_recall_tightens(spark):
    """Lloyd-refined centroids beat the first-n placeholder quantizer:
    on the sf0.1 embeddings (8k vectors), query 7, k=20, n_probe=4, recall
    vs brute force improves 0.85 -> 0.90 (measured; asserted as strict
    improvement). VERDICT r2 next-round #7."""
    e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    qv = [r[0] for r in
          e.where(F.col("vec_id") == 7).select(F.explode("embedding")).collect()]
    brute = {r.vec_id for r in ann.brute_force_topk(e, qv, k=20).collect()}
    plain = {r.vec_id for r in
             ann.ivf_topk(e, qv, k=20, n_cells=16, n_probe=4).collect()}
    cents = ann.ivf_centroids_kmeans(e, n_cells=16, iters=2)
    refined = {r.vec_id for r in
               ann.ivf_topk(e, qv, k=20, n_cells=16, n_probe=4,
                            centroids=cents).collect()}
    assert len(brute & refined) > len(brute & plain)
    assert len(brute & refined) >= 18  # 0.90 recall measured


def test_ivf_assign_covers_all(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = ann.ivf_assign(e, n_cells=8)
    assert a.count() == e.count()
    cells = {r.cell for r in a.select("cell").distinct().collect()}
    assert cells <= set(range(8)) and len(cells) > 1


def test_block_cosine_pairs_equals_brute(spark):
    from pyspark.sql import functions as F
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    sim = F.round(ann.cosine(F.col("ea"), F.col("eb")), 6)
    brute = {(r.id_a, r.id_b): r.cos_sim
             for r in (a.join(b, F.col("id_a") < F.col("id_b"))
                       .select("id_a", "id_b", sim.alias("cos_sim"))
                       .where(F.col("cos_sim") >= 0.4).collect())}
    blocked = {(r.id_a, r.id_b): r.cos_sim
               for r in ann.block_cosine_pairs(e, 0.4, blocks=4).collect()}
    assert blocked == brute and len(blocked) > 0


def test_lsh_multiprobe_improves_recall(spark):
    from pyspark.sql import functions as F
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [r[0] for r in
          e.where(F.col("vec_id") == 0).select(F.explode("embedding")).collect()]
    brute = {r.vec_id for r in ann.brute_force_topk(e, qv, k=10).collect()}
    r0 = {r.vec_id for r in ann.lsh_topk(e, qv, k=10, nbits=6,
                                         multiprobe=0).collect()}
    r1 = {r.vec_id for r in ann.lsh_topk(e, qv, k=10, nbits=6,
                                         multiprobe=1).collect()}
    r2 = {r.vec_id for r in ann.lsh_topk(e, qv, k=10, nbits=6,
                                         multiprobe=2).collect()}
    assert len(r1 & brute) >= len(r0 & brute)  # probing never hurts recall
    assert len(r2 & brute) >= len(r1 & brute)
    assert len(r2 & brute) >= 5  # 2-probe reaches decent recall on 500 vecs


def test_quantized_topk_recall(spark):
    from pyspark.sql import functions as F
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [r[0] for r in
          e.where(F.col("vec_id") == 0).select(F.explode("embedding")).collect()]
    exact = {r.vec_id for r in ann.brute_force_topk(e, qv, k=10).collect()}
    quant = {r.vec_id for r in ann.quantized_topk(e, qv, k=10).collect()}
    # int8 symmetric quantization keeps cosine ordering almost intact
    assert len(exact & quant) >= 8


def test_quantize_roundtrip_error_bounded(spark):
    import numpy as np
    e = spark.read.parquet(f"{SF}/embeddings.parquet").limit(50)
    orig = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in e.collect()}
    for r in ann.quantize_int8(e).collect():
        x = orig[r.vec_id]
        back = np.array(r.qvec, dtype=np.float64) * r.scale
        m = np.max(np.abs(x))
        assert np.max(np.abs(back - x)) <= m / 127.0 * 0.5 + 1e-12


def test_lsh_cosine_pairs_subset_of_exact(spark):
    """The LSH-bucketed pair path must be a SUBSET of the exact all-pairs
    result (it can only miss cross-bucket pairs, never invent pairs) with
    usable recall on the test corpus."""
    from pyspark.sql import functions as F
    from ksana_corpus_builder_spark.operators.ann import (
        block_cosine_pairs, lsh_cosine_pairs)
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {(r.id_a, r.id_b) for r in
             block_cosine_pairs(e, 0.4, blocks=4).collect()}
    lsh = {(r.id_a, r.id_b) for r in
           lsh_cosine_pairs(e, 0.4, nbits=4, dim=64).collect()}
    assert lsh <= exact
    # single-table sign-LSH collision probability at cosine ~0.4
    # (angle ~66 deg) is (1 - theta/pi)^nbits ~ 0.63^4 ~ 0.16; measured
    # recall must be in that ballpark (multi-table OR-amplification is the
    # production recall lever, same bucket join repeated per table)
    if exact:
        assert len(lsh) / len(exact) >= 0.1, (len(lsh), len(exact))


def test_semdedup_keep_lowest_and_subset_of_exact(spark):
    """SemDeDup invariants: (1) each cell's id-minimum is never a dup and
    has a NULL max_lower_sim; (2) every flagged dup has an exact all-pairs
    cosine partner >= threshold with a lower id (cell-local pruning is a
    SUBSET of global near-dup pairs — clustering can only miss cross-cell
    pairs, never invent similarity)."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = ann.semdedup(e, n_cells=8, iters=1, threshold=0.4).collect()
    assert len(rows) == e.count()
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r)
    for cell_rows in by_cell.values():
        lo = min(cell_rows, key=lambda r: r.vec_id)
        assert lo.max_lower_sim is None and not lo.is_dup
        for r in cell_rows:
            if r.vec_id != lo.vec_id:
                assert r.max_lower_sim is not None
    exact = {(r.id_a, r.id_b) for r in
             ann.block_cosine_pairs(e, 0.4, blocks=4).collect()}
    partners_of = {b for _, b in exact}
    for r in rows:
        if r.is_dup:
            assert r.vec_id in partners_of, r


def test_semdedup_flags_exact_duplicate(spark):
    """A literally duplicated vector (same embedding, higher id) must land
    in the same cell and be flagged with max_lower_sim == 1.0."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet").limit(64)
    clone = (e.where(F.col("vec_id") == 3)
             .select((F.col("vec_id") + 10_000).alias("vec_id"),
                     "embedding", "label"))
    out = {r.vec_id: r for r in
           ann.semdedup(e.unionByName(clone), n_cells=4, iters=1,
                        threshold=0.99).collect()}
    dup = out[10_003]
    assert dup.cell == out[3].cell
    assert dup.is_dup and dup.max_lower_sim == 1.0
