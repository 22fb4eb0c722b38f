"""Typed configuration system.

Replaces the reference's three-tier argparse/accelerate-yaml/shell-recipe config
(`/root/reference/DiFashion/train.py:39-353`, `config.yaml:1-15`, `run_eta0.1.sh:1`) with a
single dataclass tree plus named presets that reproduce the canonical recipes exactly:
eta=0.1, guidance scales (cate 12.0, mutual 5.0, hist 4.0), condition-dropout windows
(0.2, 0.3, 0.2), lr 1e-5, min-SNR gamma 5.0, batch size 2, 20k steps, ckpt every 1000,
seed 123.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple



@dataclass(frozen=True)
class UNetConfig:
    """SD2-base UNet2DConditionModel architecture (the reference loads it via
    diffusers `from_pretrained`, `/root/reference/DiFashion/models/difashion.py:77-79`,
    then widens conv_in 4->8 channels, `difashion.py:82-93`)."""

    sample_size: int = 64
    in_channels: int = 8                 # [latents(4), history latents(4)]
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024      # SD2 text width
    attention_head_dim: int = 64         # SD2 uses fixed 64-dim heads
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    use_linear_projection: bool = True   # SD2 transformer blocks use linear in/out proj
    fixed_num_heads: Optional[int] = None  # SD1.x: 8 heads/block (head_dim = ch/8);
                                           # None -> heads = ch // attention_head_dim (SD2)
    norm_num_groups: int = 32
    freq_shift: int = 0
    flip_sin_to_cos: bool = True

    @staticmethod
    def tiny() -> "UNetConfig":
        """CPU-testable miniature with the same topology."""
        return UNetConfig(
            sample_size=8,
            block_out_channels=(32, 64, 64, 64),
            layers_per_block=1,
            cross_attention_dim=32,
            attention_head_dim=16,
            norm_num_groups=8,
        )


@dataclass(frozen=True)
class VAEConfig:
    """AutoencoderKL architecture (reference: diffusers VAE,
    `/root/reference/DiFashion/models/difashion.py:74-75`)."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    sample_size: int = 512

    @property
    def scale_factor(self) -> int:
        """Spatial down-scale: 2**(len(blocks)-1) (`difashion.py:75`)."""
        return 2 ** (len(self.block_out_channels) - 1)

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(
            block_out_channels=(16, 16, 32, 32),
            layers_per_block=1,
            norm_num_groups=8,
            sample_size=64,
        )


@dataclass(frozen=True)
class CLIPTextConfig:
    """SD2-base text encoder (OpenCLIP ViT-H text tower in HF CLIPTextModel form;
    reference loads it at `/root/reference/DiFashion/models/difashion.py:70-72`)."""

    vocab_size: int = 49408
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 23
    num_heads: int = 16
    max_position_embeddings: int = 77
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-5

    @staticmethod
    def tiny() -> "CLIPTextConfig":
        return CLIPTextConfig(
            vocab_size=1000,
            hidden_size=32,
            intermediate_size=64,
            num_layers=2,
            num_heads=4,
        )


@dataclass(frozen=True)
class MutualEncoderConfig:
    """MutualEncoder MLP (reference `/root/reference/DiFashion/models/difashion.py:21-46`):
    Linear(C*S*S -> hid) -> LeakyReLU -> Dropout(0.1) -> Linear(hid -> C*S*S) -> Tanh.
    The reference also carries an *unused* `category_embedding` (difashion.py:28, commented
    "useless embedding"); we keep it out of compute but reserve a checkpoint-compat slot."""

    latent_channels: int = 4
    latent_size: int = 64
    hid_dim: int = 256
    dropout: float = 0.1
    cate_num: int = 50
    cate_emb_size: int = 64
    keep_unused_category_embedding: bool = True


@dataclass(frozen=True)
class SchedulerConfig:
    """SD2-base PNDM scheduler config (reference loads it from the HF hub,
    `/root/reference/DiFashion/models/difashion.py:64`)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"
    steps_offset: int = 1
    skip_prk_steps: bool = True
    set_alpha_to_one: bool = False
    timestep_spacing: str = "leading"


@dataclass(frozen=True)
class ModelConfig:
    unet: UNetConfig = field(default_factory=UNetConfig)
    vae: VAEConfig = field(default_factory=VAEConfig)
    text: CLIPTextConfig = field(default_factory=CLIPTextConfig)
    mutual: MutualEncoderConfig = field(default_factory=MutualEncoderConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)

    @staticmethod
    def sd2_base() -> "ModelConfig":
        return ModelConfig()

    @staticmethod
    def sd15() -> "ModelConfig":
        """SD-v1.5 family (the graft baseline's 'fine-tune from SD-v1.5' config):
        768-wide CLIP ViT-L text tower (quick_gelu), conv transformer projections,
        8 fixed attention heads per block."""
        return ModelConfig(
            unet=UNetConfig(
                cross_attention_dim=768,
                use_linear_projection=False,
                fixed_num_heads=8,
            ),
            text=CLIPTextConfig(
                hidden_size=768,
                intermediate_size=3072,
                num_layers=12,
                num_heads=12,
                hidden_act="quick_gelu",
            ),
        )

    @staticmethod
    def tiny() -> "ModelConfig":
        """A topology-identical miniature for CPU tests: 8x8 latents, 64px images."""
        unet = UNetConfig.tiny()
        vae = VAEConfig.tiny()
        text = CLIPTextConfig.tiny()
        mutual = MutualEncoderConfig(
            latent_channels=4, latent_size=unet.sample_size, hid_dim=32
        )
        return ModelConfig(unet=unet, vae=vae, text=text, mutual=mutual)


@dataclass(frozen=True)
class TrainConfig:
    """Reproduces the `run_eta0.1.sh` recipe (`/root/reference/DiFashion/run_eta0.1.sh:1`,
    `train.py` defaults at :39-353)."""

    learning_rate: float = 1e-5
    scale_lr: bool = False                # train.py:567-570 rule, available as option
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    use_8bit_adam: bool = False           # bitsandbytes AdamW8bit equivalent
    max_grad_norm: float = 1.0
    train_batch_size: int = 2             # outfits per device batch
    gradient_accumulation_steps: int = 1
    max_train_steps: int = 20000          # hard stop (train.py:837)
    lr_scheduler: str = "constant"
    lr_warmup_steps: int = 0
    checkpointing_steps: int = 1000
    checkpoints_total_limit: Optional[int] = None
    seed: int = 123
    use_ema: bool = True
    use_ema_fashion: bool = True
    ema_decay: float = 0.9999
    snr_gamma: Optional[float] = 5.0
    noise_offset: float = 0.0
    prediction_type: Optional[str] = None  # None -> use scheduler's
    # Condition-dropout windows (train.py:156-160 call: 0.2, 0.3, 0.2):
    mask_ratio: float = 0.2                # "mask_ratio" (history window start)
    coupling_mask_ratio: float = 0.3
    cate_mask_ratio: float = 0.2
    eta: float = 0.1                       # mutual-condition blend weight
    use_history: bool = True
    use_mutual_guidance: bool = True
    mixed_precision: str = "bf16"          # reference uses fp16; bf16 is TPU-native
    gradient_checkpointing: bool = False
    # remat checkpoint policy when gradient_checkpointing is on. Measured
    # single-process interleaved A/B at SD2-base scale (tools/bench_remat_ab.py,
    # tools/logs/remat_ab_r4.log): dots_no_batch 0.3319 s/step vs default
    # save-nothing 0.3459 (-4.1%); plain "dots" OOMs 16 GiB (saves batch-dim
    # MXU outputs).
    remat_policy: Optional[str] = "dots_no_batch"   # None | "dots" | "dots_no_batch"
    skip_nonfinite_updates: bool = True    # NaN/Inf grad guard: hold params, count skips
    # Parallelism
    dp_size: int = -1                      # -1 => all available devices
    output_dir: str = "ckpt"
    resume_from_checkpoint: Optional[str] = None  # "latest" or explicit path


@dataclass(frozen=True)
class GenerationConfig:
    """Reproduces `run_inf4eval.sh` / inf4eval defaults
    (`/root/reference/DiFashion/inf4eval.py:60-367`, scales at train.py:161-180)."""

    num_inference_steps: int = 50
    category_guidance_scale: float = 12.0
    hist_guidance_scale: float = 4.0
    mutual_guidance_scale: float = 5.0
    eta: float = 0.1
    scheduler: str = "pndm"               # "pndm" | "ddim" | "dpmpp" (fast serving)
    ddim_eta: float = 0.0
    fitb_batch_size: int = 15             # inf4eval.py:521-524
    gor_batch_size: int = 4
    seed: int = 123
    height: int = 512
    width: int = 512


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "polyvore"             # "ifashion" | "polyvore"
    data_path: str = "datasets/polyvore"
    img_folder_path: str = "datasets/polyvore/images"
    img_size: int = 512
    outfit_length: int = 4                # every outfit record has exactly 4 items


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    generation: GenerationConfig = field(default_factory=GenerationConfig)
    data: DataConfig = field(default_factory=DataConfig)

    # ---- presets -------------------------------------------------------------

    @staticmethod
    def preset_eta01() -> "Config":
        """The canonical training recipe (`run_eta0.1.sh`)."""
        return Config()

    @staticmethod
    def preset_tiny() -> "Config":
        """CPU-runnable miniature for tests and the end-to-end smoke slice."""
        return Config(
            model=ModelConfig.tiny(),
            data=DataConfig(img_size=64),
            generation=dataclasses.replace(
                GenerationConfig(), num_inference_steps=5, height=64, width=64
            ),
        )

    # ---- (de)serialization ---------------------------------------------------

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @staticmethod
    def from_dict(d: dict) -> "Config":
        def build(cls, sub):
            kwargs = {}
            for f in dataclasses.fields(cls):
                if f.name not in sub:
                    continue
                v = sub[f.name]
                if dataclasses.is_dataclass(f.type) or f.name in (
                    "unet", "vae", "text", "mutual", "scheduler",
                    "model", "train", "generation", "data",
                ):
                    sub_cls = _SUBCONFIGS.get(f.name)
                    if sub_cls is not None and isinstance(v, dict):
                        v = build(sub_cls, v)
                elif isinstance(v, list):
                    v = tuple(v)
                kwargs[f.name] = v
            return cls(**kwargs)

        return build(Config, d)

    @staticmethod
    def from_json(s: str) -> "Config":
        return Config.from_dict(json.loads(s))


_SUBCONFIGS = {
    "unet": UNetConfig,
    "vae": VAEConfig,
    "text": CLIPTextConfig,
    "mutual": MutualEncoderConfig,
    "scheduler": SchedulerConfig,
    "model": ModelConfig,
    "train": TrainConfig,
    "generation": GenerationConfig,
    "data": DataConfig,
}
