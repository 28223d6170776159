"""Device-mesh scale-out: shard the env axis, replicate params (SURVEY.md §2.3)."""

from .sharding import (env_axis_sharding, make_mesh, place_train_state)  # noqa: F401
