from grouptraj.models.modules import (  # noqa: F401
    init_gat_encoder, gat_encoder,
    init_gat_encoder_mh, gat_encoder_mh,
    init_gcn_module, gcn_module,
    init_gcn_pooling, gcn_pooling,
)
from grouptraj.models.generator import (  # noqa: F401
    init_generator, generator_forward,
)
from grouptraj.models.discriminator import (  # noqa: F401
    init_discriminator, discriminator_forward,
)
