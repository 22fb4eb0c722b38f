from difashion_tpu.engine.generate import (
    GenerationInputs,
    GuidanceSpec,
    build_sampler,
    decode_and_postprocess,
    decode_to_uint8,
    make_guidance_spec,
)
from difashion_tpu.engine.train import (
    EMAState,
    TrainBatch,
    TrainState,
    build_train_step,
    difashion_loss,
    make_mesh,
    make_optimizer,
    shard_train_step,
)

__all__ = [
    "GenerationInputs",
    "GuidanceSpec",
    "build_sampler",
    "decode_and_postprocess",
    "decode_to_uint8",
    "make_guidance_spec",
    "EMAState",
    "TrainBatch",
    "TrainState",
    "build_train_step",
    "difashion_loss",
    "make_mesh",
    "make_optimizer",
    "shard_train_step",
]
