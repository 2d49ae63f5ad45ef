from grouptraj.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicated_sharding, shard_arrays,
    replicate_state,
)
from grouptraj.parallel.data_parallel import dryrun_multichip  # noqa: F401
