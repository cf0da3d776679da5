

def test_mixture_weights_math(spark):
    import math
    from decimal import Decimal

    from rdf_spark.ops.sample import mixture_weights

    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 20
    df = spark.createDataFrame(rows, "dom string")
    for alpha in (0.5, 1.0, 0.25):
        got = {r.dom: (r.n_docs, r.weight, r.repeat_factor)
               for r in mixture_weights(df, "dom", alpha=alpha).collect()}
        den = sum(Decimal(str(round(n ** alpha, 9)))
                  for n in (50, 30, 20))
        for dom, n in (("a", 50), ("b", 30), ("c", 20)):
            w = float(Decimal(str(round(n ** alpha, 9)))) / float(den)
            assert got[dom][0] == n
            assert got[dom][1] == round(w, 6), (alpha, dom)
            assert got[dom][2] == round(w * 100 / n, 6)
    # alpha=1 keeps natural proportions; alpha<1 boosts the tail domain
    nat = {r.dom: r.repeat_factor
           for r in mixture_weights(df, "dom", alpha=1.0).collect()}
    assert all(abs(v - 1.0) < 1e-9 for v in nat.values())
    flat = {r.dom: r.repeat_factor
            for r in mixture_weights(df, "dom", alpha=0.25).collect()}
    assert flat["c"] > 1.0 > flat["a"]
