from sbayes_tpu.parallel.mesh import chain_mesh, shard_chain_batch  # noqa: F401
