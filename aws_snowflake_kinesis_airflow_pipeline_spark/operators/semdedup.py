"""SemDeDup — cluster-scoped semantic deduplication of embeddings.

The SemDeDup recipe (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", arXiv:2303.09540): k-means
the embedding space, then look for duplicate pairs only WITHIN each
cluster — semantically identical points land in the same cell, so the
quadratic pair search runs per-cell instead of corpus-wide. This is the
third member of the engine's embedding-dedup family and covers a different
trade-off than the other two:

* ``dedup.embedding_near_dups`` (hyperplane LSH): sub-quadratic candidate
  generation, recall set by the banding S-curve.
* ``operators/incremental`` (persisted LSH index): streaming arrivals.
* this module: exact WITHIN-CLUSTER recall at a chosen clustering
  granularity — the published recipe for curating web-scale pretraining
  corpora, where a bounded per-cluster matmul is cheaper than tuning LSH.

Scale shape: centroids come from ``similarity.ivf_index`` (bounded-sample
driver fit, one Arrow-batched assignment pass); the per-cluster pairwise
search is ``applyInPandas`` over the cluster key — one exchange, then an
O(m²/2) numpy matmul per cell. The m² is the SemDeDup design point, made
safe by ``max_cluster_rows``: oversized cells raise instead of silently
OOMing — at corpus scale you raise ``n_clusters`` (the paper runs 50k
clusters for 5B points) so cells stay bounded.

Exact-duplicate recall is structural, not probabilistic: assignment is a
deterministic function of the vector, so identical vectors ALWAYS share a
cell and are always found. Near-duplicates straddling a Voronoi boundary
can be missed — inherent to the method and measured in tests against the
brute-force all-pairs ground truth.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .dedup import connected_components
from .similarity import ivf_index
from .spread import scaled_repartition as _scaled_repartition


def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.95,
    seed: int = 42,
    max_cluster_rows: int = 100_000,
    max_fit_rows: int = 100_000,
    indexed: DataFrame | None = None,
) -> DataFrame:
    """Duplicate pairs (id1 < id2, cosine) found within k-means cells.

    Cosine is rounded to 4 dp (engine-wide float-parity convention).
    ``max_fit_rows`` bounds the centroid-fit sample exactly as in
    ``similarity.ivf_index`` (centroids converge far below the corpus).

    ``indexed``: a pre-assigned frame (id_col, vec_col, ivf_cluster) from
    an ``ivf_index`` the caller already built — e.g. a plan that ALSO
    serves IVF probes from the same clustering pays one fit and one
    assignment pass instead of two (the ``pairs=`` passthrough precedent
    one level up). Must cover the same rows as ``df``; the clustering
    granularity knobs (``n_clusters``/``seed``/``max_fit_rows``) are the
    index's, not this call's.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError("semantic_dedup_pairs: threshold must be in (0, 1]")
    if indexed is None:
        _, indexed = ivf_index(
            df.select(id_col, vec_col),
            vec_col,
            n_clusters,
            seed=seed,
            max_fit_rows=max_fit_rows,
        )

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m > max_cluster_rows:
            raise RuntimeError(
                f"semantic_dedup_pairs: cluster has {m} rows > "
                f"max_cluster_rows={max_cluster_rows}; raise n_clusters "
                "so the per-cell pairwise search stays bounded"
            )
        if m < 2:
            return pd.DataFrame({"id1": [], "id2": [], "cosine": []})
        ids = pdf[id_col].to_numpy()
        v = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(v, axis=1)
        norms[norms == 0.0] = 1.0  # zero vectors match nothing (cos 0)
        vn = v / norms[:, None]
        # Row-blocked upper-triangle matmul (the dedup._bucket_pairs
        # discipline): a full m x m sims matrix is m^2-quadratic per
        # WORKER — max_cluster_rows bounds ROWS (100k) but an unblocked
        # matrix at even a 20-50k-row k-means cell is 3-20 GB, and 32
        # concurrent workers of that was the round-11 kernel OOM at the
        # 20 M-vector decade (k-means cells are NOT uniform; replica-blob
        # data concentrates). Blocks keep peak memory at block x m.
        out_i, out_j, out_c = [], [], []
        block = 4096
        for b0 in range(0, m, block):
            sims_blk = np.round(vn[b0 : b0 + block] @ vn.T, 4)
            for bi in range(sims_blk.shape[0]):
                i = b0 + bi
                hits = np.flatnonzero(sims_blk[bi, i + 1 :] >= threshold) + i + 1
                if len(hits) == 0:
                    continue
                a = np.full(len(hits), ids[i])
                b = ids[hits]
                out_i.append(np.minimum(a, b))
                out_j.append(np.maximum(a, b))
                out_c.append(sims_blk[bi, hits])
        if not out_i:
            return pd.DataFrame({"id1": [], "id2": [], "cosine": []}).astype(
                {"id1": "int64", "id2": "int64", "cosine": "float64"}
            )
        return pd.DataFrame(
            {
                "id1": np.concatenate(out_i),
                "id2": np.concatenate(out_j),
                "cosine": np.concatenate(out_c),
            }
        )

    # NULL / wrong-length vectors get a NULL ivf_cluster from
    # ivf_assign_udf; without this filter they all land in ONE pandas
    # group whose ragged tolist() kills np.linalg.norm — the sibling
    # embedding operators degrade gracefully on the same inputs, and an
    # invalid vector can never be a semantic duplicate anyway.
    #
    # The per-cell exchange is the one corpus-volume shuffle here and it
    # carries FULL vectors (4·dim bytes/row), so it auto-sizes to the
    # input like every other corpus-volume exchange (spread.py; the
    # embedding_near_dup_pairs precedent, dedup.py): a session-default
    # partition count would build whole-corpus-fraction pandas groups in
    # memory at 10x+ the bench SF. Sized from ``df``'s file lineage —
    # when the caller hands in a checkpointed ``indexed``, df is still
    # the file-backed original; no-op at bench SFs.
    cells = _scaled_repartition(
        indexed.filter(F.col("ivf_cluster").isNotNull()),
        "ivf_cluster",
        source=df,
    )
    return cells.groupBy("ivf_cluster").applyInPandas(
        per_cluster, "id1 long, id2 long, cosine double"
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.95,
    seed: int = 42,
    max_cluster_rows: int = 100_000,
    pairs: DataFrame | None = None,
    max_fit_rows: int = 100_000,
) -> DataFrame:
    """SemDeDup survivors: one representative (min id) per duplicate
    component; rows in no duplicate pair survive untouched. Returns the
    input rows minus dropped duplicates.

    ``pairs`` lets a caller that ALSO needs the pair set (audit,
    precision recheck) hand in one :func:`semantic_dedup_pairs` result
    instead of paying the per-cell pairwise pass twice; it must come
    from the same df/threshold or the survivor set is undefined."""
    if pairs is None:
        pairs = semantic_dedup_pairs(
            df,
            id_col,
            vec_col,
            n_clusters,
            threshold,
            seed,
            max_cluster_rows,
            max_fit_rows,
        )
    comp = connected_components(pairs)
    dropped = (
        comp.groupBy("component")
        .agg(F.min("id").alias("_keep"))
        .join(comp, "component")
        .filter(F.col("id") != F.col("_keep"))
        .select(F.col("id").alias(id_col))
    )
    return df.join(dropped, id_col, "left_anti")
