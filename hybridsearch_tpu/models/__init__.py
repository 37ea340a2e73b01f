from hybridsearch_tpu.models.encoder import (  # noqa: F401
    Encoder,
    HashingEncoder,
    default_encoder,
)
