#!/usr/bin/env python
"""A/B profile of the round-2 bench-regression suspects (VERDICT r2 §perf).

Runs each variant N times in ONE warmed session at $SPARK_GRAFT_SF_DIR and
prints a JSON table {variant: [sec, ...]}. Variants:

- lsh_collect:   HEAD pair expansion — groupBy(band,bkey) + collect_list +
                 explode of in-bucket pairs (one linear pass, cap-able).
- lsh_selfjoin:  round-1 shape — bands ⋈ bands self-join on (band, bkey)
                 (recomputes the shingle→minhash pipeline per side).
- gemm_jvm_norm: HEAD — _with_normalized (interpreted Catalyst lambdas)
                 feeding the per-bucket numpy GEMM.
- gemm_np_norm:  candidate — raw embeddings into applyInPandas, L2
                 normalization vectorized in numpy inside the bucket kernel.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_ITER = int(os.environ.get("PERF_AB_ITERS", "3"))


def lsh_selfjoin(spark, sf_dir):
    """Round-1-shaped pair generation: bands self-join on (band, bkey)."""
    from pyspark.sql import functions as F

    from iceberg_explorer_spark.operators.dedup import (
        MINHASH_P,
        N_BANDS,
        N_HASHES,
        _lcg_params,
        hashed_shingles,
    )

    hashed = hashed_shingles(spark, sf_dir, distinct=False).select(
        "doc_id", (F.col("hb") % MINHASH_P).alias("hb")
    )
    mins = []
    for i in range(N_HASHES):
        a, b = _lcg_params(i)
        mins.append(
            F.min((F.lit(a) * F.col("hb") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"h{i}")
        )
    sig = hashed.groupBy("doc_id").agg(*mins)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws("|", *[F.col(f"h{b * 3 + r}") for r in range(3)])
                ).alias("bkey"),
            )
            for b in range(N_BANDS)
        ]
    )
    bands = sig.select("doc_id", F.explode(band_structs).alias("bb")).select(
        "doc_id", "bb.band", "bb.bkey"
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bkey") == F.col("b.bkey"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
    )
    return cand.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_shared_bands")
    )


def gemm_np_norm(spark, sf_dir):
    """Per-bucket GEMM with numpy-side normalization (no JVM lambda stage)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from iceberg_explorer_spark.operators.similarity import (
        _gemm_schema,
        _srp_code_sql,
        gemm_upper_pairs,
    )
    from iceberg_explorer_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    coded = emb.withColumn("bucket", F.expr(_srp_code_sql("embedding"))).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e"), "bucket"
    )

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "vec_a": pd.Series(dtype="int64"),
                "vec_b": pd.Series(dtype="int64"),
                "cos_sim": pd.Series(dtype="float64"),
            }
        )
        if len(pdf) < 2:
            return empty
        order = pdf["vec_id"].to_numpy().argsort()
        ids = pdf["vec_id"].to_numpy()[order]
        m = np.stack(pdf["e"].to_numpy()[order])
        m = m / np.sqrt((m * m).sum(axis=1, keepdims=True))
        blocks = [
            pd.DataFrame({"vec_a": va, "vec_b": vb, "cos_sim": cs})
            for va, vb, cs in gemm_upper_pairs(ids, m)
        ]
        return pd.concat(blocks, ignore_index=True) if blocks else empty

    pairs = coded.groupBy("bucket").applyInPandas(per_bucket, _gemm_schema())
    return (
        pairs.select("vec_a", "vec_b", F.round("cos_sim", 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), "vec_a", "vec_b")
        .limit(20)
    )


def main() -> None:
    from iceberg_explorer_spark.operators import QUERIES
    from iceberg_explorer_spark.session import build_session

    spark = build_session(app_name="perf_ab", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    variants = {
        "lsh_collect": QUERIES["dedup_minhash_lsh"].builder,
        "lsh_selfjoin": lsh_selfjoin,
        "gemm_jvm_norm": QUERIES["similarity_bucket_gemm"].builder,
        "gemm_np_norm": gemm_np_norm,
    }
    warm_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR
    for fn in variants.values():
        fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
    out: dict[str, list[float]] = {name: [] for name in variants}
    for _ in range(N_ITER):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            out[name].append(round(time.perf_counter() - t0, 3))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
