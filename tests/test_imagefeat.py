"""Color-histogram image features + content-based similarity search.

Pins: Spark feature pass == pure-numpy reference bit-exactly; unit L2
norm; retrieval sanity (a planted near-identical image ranks first for
its query, beating unrelated images) against a brute-force numpy cosine
oracle; and composition with the stored IVF layout contract."""

import numpy as np

from geowave_spark.functions import imagecodec as codec
from geowave_spark.functions import imagefeat
from geowave_spark.sources import images


from conftest import image_rows as _rows


def test_spark_features_match_numpy_reference(spark):
    rows = _rows(36)
    df = spark.createDataFrame(rows, images.SCHEMA)
    got = {r["image_id"]: np.array(r["embedding"]) for r in imagefeat.compute_features(df).collect()}
    assert len(got) == 36
    for r in rows:
        expect = imagefeat.histogram64(codec.decode_image(r["bytes"], r["fmt"])).astype(
            np.float32
        )
        np.testing.assert_array_equal(got[r["image_id"]], expect)
        assert abs(float(np.linalg.norm(expect)) - 1.0) < 1e-5


def test_similarity_topk_matches_numpy_oracle(spark):
    """Top-k retrieval over 30 corpus images for 3 queries equals the
    brute-force numpy cosine ranking (micro-unit ties broken by id), and
    a planted near-identical corpus image ranks first for its query."""
    rows = _rows(30)
    # plant: corpus image that is a lossless re-encode of query img2
    arr = images.pixels_for(2)
    rows.append(
        {
            "image_id": "zclone2",
            "bytes": codec.encode_image(arr, "bmp"),
            "w": arr.shape[1],
            "h": arr.shape[0],
            "fmt": "bmp",
            "caption": "re-encode of img2",
            "phash": 0,
        }
    )
    qrows = [r for r in rows if r["image_id"] in ("img0000000002", "img0000000005", "img0000000008")]
    corpus_rows = [r for r in rows if r["image_id"] not in ("img0000000002", "img0000000005", "img0000000008")]
    corpus = spark.createDataFrame(corpus_rows, images.SCHEMA)
    queries = spark.createDataFrame(qrows, images.SCHEMA)
    got = imagefeat.image_similarity_topk(corpus, queries, k=5).collect()

    # numpy oracle with the same micro-unit rounding + id tie-break
    feats = {
        r["image_id"]: imagefeat.histogram64(codec.decode_image(r["bytes"], r["fmt"])).astype(
            np.float32
        ).astype(np.float64)
        for r in rows
    }

    def cos_mu(a, b):
        d = float(np.sqrt((a * a).sum()) * np.sqrt((b * b).sum()))
        c = float((a * b).sum()) / d if d > 0 else 0.0
        return int(np.floor(c * 1e6 + 0.5))

    for q in qrows:
        ranked = sorted(
            ((cos_mu(feats[q["image_id"]], feats[r["image_id"]]), r["image_id"]) for r in corpus_rows),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        mine = sorted(
            [r for r in got if r["query_id"] == q["image_id"]], key=lambda r: r["rank"]
        )
        assert [(r["cos_mu"], r["image_id"]) for r in mine] == ranked
    # the planted clone dominates its query (the query itself is stored
    # lossy-jpeg, so cosine vs the lossless clone is near-1, not exactly 1)
    top2 = [r for r in got if r["query_id"] == "img0000000002" and r["rank"] == 1][0]
    assert top2["image_id"] == "zclone2"
    # real baseline-JPEG quantization (q=98) moves the color histogram
    # slightly more than the old GWDC stand-in did; "near-1" margin
    assert top2["cos_mu"] >= 995_000


def test_features_compose_with_stored_ann_contract(spark, tmp_path):
    """compute_features output drops into the written IVF layout: write,
    probe, and confirm the clone is retrieved through the stored path."""
    from geowave_spark.sources import vectors as vstore

    rows = _rows(24)
    arr = images.pixels_for(3)
    rows.append(
        {
            "image_id": "zclone3",
            "bytes": codec.encode_image(arr, "bmp"),
            "w": arr.shape[1],
            "h": arr.shape[0],
            "fmt": "bmp",
            "caption": "re-encode of img3",
            "phash": 0,
        }
    )
    df = spark.createDataFrame(rows, images.SCHEMA)
    feats = imagefeat.compute_features(df, out_col="embedding").withColumnRenamed(
        "image_id", "vec_id"
    )
    path = str(tmp_path / "imgvecs")
    vstore.write_vectors_ivf(feats, path, n_lists=4, pq_m=8)
    q = feats.filter(feats.vec_id == "img0000000003")
    got = vstore.stored_ann_topk(spark, path, q, k=3, n_probe=4, rerank=10).collect()
    ids = [r["vec_id"] for r in sorted(got, key=lambda r: r["rank"])]
    assert ids[0] in ("img0000000003", "zclone3") and ids[1] in ("img0000000003", "zclone3")
