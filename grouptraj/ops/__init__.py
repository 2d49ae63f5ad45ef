from grouptraj.ops.linear import (  # noqa: F401
    init_linear, linear, init_mlp, mlp_forward,
)
from grouptraj.ops.lstm import (  # noqa: F401
    init_lstm, lstm_cell, lstm_scan,
)
from grouptraj.ops.noise import get_noise  # noqa: F401
from grouptraj.ops.pooling import init_pool_hidden_net, pool_hidden_net  # noqa: F401
from grouptraj.ops.gat import init_gat_layer, gat_layer, init_gat, gat  # noqa: F401
from grouptraj.ops.gcn import init_gcn, gcn  # noqa: F401
from grouptraj.ops.groups import (  # noqa: F401
    intra_group_adjacency, group_membership, normalize_adjacency,
)
