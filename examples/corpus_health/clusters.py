"""Embedding-space topic structure: deterministic distributed k-means
(bit-reproducible at any parallelism) with per-cluster size, inertia,
majority label and purity."""
from basis_devkit_spark import *


@node
def clusters(
    embeddings=InputTable,
    out=OutputTable,
    k=Parameter(type="int", default=8),
    iters=Parameter(type="int", default=2),
):
    from basis_devkit_spark.operators.clustering import kmeans_cluster_report

    out.replace(
        kmeans_cluster_report(
            embeddings.read_dataframe(), "vec_id", "embedding",
            k=int(k), iters=int(iters), label_col="label",
        )
    )
