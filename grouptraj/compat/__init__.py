from grouptraj.compat.torch_import import (  # noqa: F401
    config_from_checkpoint_args, import_discriminator, import_generator,
    load_torch_checkpoint,
)
