from quickstep_tpu.parallel.mesh import make_mesh, shard_rows, replicate  # noqa: F401
