"""Embedding covariance + PCA (ops/ann.py round-5 additions)."""
import numpy as np
import pytest

from rdf_spark.ops.ann import embedding_covariance, pca_model, pca_project

D = 6


def _vecs(spark, n=40, seed=7):
    rng = np.random.default_rng(seed)
    # anisotropic: two dominant directions
    base = rng.normal(size=(n, 2)) @ rng.normal(size=(2, D)) * 3.0
    x = base + rng.normal(size=(n, D)) * 0.3 + rng.normal(size=D)
    rows = [(i, [float(np.float32(v)) for v in x[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        np.asarray([r[1] for r in rows], dtype=np.float64),
    )


class TestCovariance:
    def test_matches_numpy(self, spark):
        df, x = _vecs(spark)
        got = {(r.i, r.j): r.cov
               for r in embedding_covariance(df, D).collect()}
        ref = np.cov(x, rowvar=False, ddof=0)
        assert len(got) == D * (D + 1) // 2
        for (i, j), c in got.items():
            assert c == pytest.approx(ref[i, j], abs=1e-8), (i, j)

    def test_partitioning_exact(self, spark):
        df, _ = _vecs(spark)
        a = sorted(embedding_covariance(df.repartition(1), D).collect())
        b = sorted(embedding_covariance(df.repartition(9), D).collect())
        assert a == b

    def test_bad_rows_filtered(self, spark):
        df, x = _vecs(spark, n=10)
        bad = spark.createDataFrame(
            [(99, None), (98, [1.0, 2.0])],
            "vec_id long, embedding array<float>",
        )
        a = sorted(embedding_covariance(df, D).collect())
        b = sorted(embedding_covariance(df.unionByName(bad), D).collect())
        assert a == b


class TestPca:
    def test_projected_covariance_is_diagonal(self, spark):
        df, x = _vecs(spark)
        model = pca_model(df, D, k=3)
        out = pca_project(df, model, out_col="p")
        y = np.asarray([r.p for r in out.collect()])
        cy = np.cov(y, rowvar=False, ddof=0)
        off = cy - np.diag(np.diag(cy))
        assert np.abs(off).max() < 1e-6
        # diagonal ≈ the top eigenvalues, descending
        assert np.allclose(np.diag(cy), model["variances"], atol=1e-6)
        assert model["variances"] == sorted(model["variances"],
                                            reverse=True)

    def test_whiten_unit_variance(self, spark):
        df, _ = _vecs(spark)
        model = pca_model(df, D, k=2)
        y = np.asarray([
            r.p for r in pca_project(df, model, out_col="p",
                                     whiten=True).collect()
        ])
        assert np.allclose(np.var(y, axis=0), 1.0, atol=1e-6)

    def test_deterministic_sign_and_rerun(self, spark):
        df, _ = _vecs(spark)
        m1 = pca_model(df, D, k=2)
        m2 = pca_model(df.repartition(5), D, k=2)
        assert m1["components"] == m2["components"]
        for c in m1["components"]:
            amax = int(np.argmax(np.abs(c)))
            assert c[amax] > 0

    def test_null_and_wrong_dim_project_to_null(self, spark):
        df, _ = _vecs(spark, n=5)
        bad = spark.createDataFrame(
            [(99, None)], "vec_id long, embedding array<float>")
        model = pca_model(df, D, k=2)
        out = {r.vec_id: r.p for r in
               pca_project(df.unionByName(bad), model,
                           out_col="p").collect()}
        assert out[99] is None and len(out[0]) == 2

    def test_k_validates(self, spark):
        df, _ = _vecs(spark, n=5)
        with pytest.raises(ValueError):
            pca_model(df, D, k=0)
