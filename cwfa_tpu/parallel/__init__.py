"""Device meshes and sharding plans (no reference counterpart: the reference
is single-GPU by design, SURVEY.md §2.6/§5.8; this is the TPU-idiomatic
scale-out layer)."""

from cwfa_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicate, sharded_train_step, sharded_reconstruct,
)
from cwfa_tpu.parallel.distributed import (  # noqa: F401
    initialize_from_env, is_primary, host_local_indices, global_batch_array,
)
