from sbayes_tpu.ops.mst import cluster_mst_edge_costs  # noqa: F401
