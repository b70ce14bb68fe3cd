from .mesh import (make_mesh, shard_batch, replicate, render_wave_sharded,
                   train_step_sharded)  # noqa: F401
