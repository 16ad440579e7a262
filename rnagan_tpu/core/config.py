"""Typed configuration tree.

The PyTorch reference splits experiment state between JSON config files
(reference ``src/betaVAE_training.py:53-59``, ``src/histopathology_gan.py:93-101``)
and hardcoded literals scattered through the code (GAN ``batch_size=8`` at
``histopathology_gan.py:94``; TTUR Adam lrs 1e-4/4e-4, betas (0.5, 0.999) at
``:252,257``; GP lambda=10 at ``wgan_loss.py:287``; noise range +-0.3 at
``wgan_loss.py:100``; VAE arch [6000,4000,2048]/[4000,6000], z=2048 repeated at
``betaVAE_training.py:136``, ``wgan_loss.py:67`` ...).

Here every knob is a named, typed field with the reference value as default, and
``load_reference_json`` ingests the reference's JSON config format
(``configs/betavae_tissues.json``, ``configs/gan_run*.json``) unchanged.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


def _asdict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. The reference has no distributed story (optional
    single-process ``nn.DataParallel`` only, reference ``betaVAE_training.py:148-150``);
    in the TPU build the data axis is the first-class scaling dimension and a
    model axis is reserved for future tensor sharding.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    #: -1 = use all visible devices on the data axis.
    data: int = -1
    model: int = 1


@dataclass(frozen=True)
class VAEModelConfig:
    """betaVAE architecture (reference ``betaVAE.py:63-94``, defaults from
    ``betaVAE_training.py:136`` / ``wgan_loss.py:67``)."""

    rna_features: int = 19198
    z_dim: int = 2048
    encoder_dims: Tuple[int, ...] = (6000, 4000, 2048)
    decoder_dims: Tuple[int, ...] = (4000, 6000)
    beta: float = 0.0005
    dropout_rate: float = 0.5  # torch nn.Dropout() default, reference betaVAE.py:27
    leaky_slope: float = 0.01  # torch nn.LeakyReLU() default, reference betaVAE.py:34
    #: parameter dtype is always float32; compute dtype may be bfloat16 on TPU.
    compute_dtype: str = "float32"


@dataclass(frozen=True)
class VAEConfig:
    """betaVAE training run (reference ``configs/betavae_tissues.json`` +
    ``betaVAE_training.py``)."""

    model: VAEModelConfig = field(default_factory=VAEModelConfig)
    lr: float = 5e-5
    weight_decay: float = 0.0
    optimizer: str = "adam"  # adam | sgd | radam (betaVAE_training.py:157-162)
    batch_size: int = 128
    num_epochs: int = 500
    #: GradualWarmupScheduler(total_epoch=1000) wrapping CosineAnnealingLR(500),
    #: stepped per *batch* (reference betaVAE.py:234-235, betaVAE_training.py:165-166).
    warmup_steps: int = 1000
    cosine_steps: int = 500
    log_interval: int = 100
    seed: int = 99
    mesh: MeshConfig = field(default_factory=MeshConfig)


@dataclass(frozen=True)
class GANModelConfig:
    """DCGAN-family architecture (reference ``histopathology_gan.py:175-246``)."""

    #: dcgan | dcgan_up | condgan | sagan | biggan. The last two are the
    #: reference's intended-but-never-shipped attention families
    #: (histopathology_gan.py:211-244 import missing modules, SURVEY.md 2.5) —
    #: built here as models/sagan.py and models/biggan.py.
    arch: str = "dcgan"
    encoding_dims: int = 2048
    out_size: int = 256
    out_channels: int = 3
    step_channels: int = 64
    leaky_slope: float = 0.2
    #: applied after the discriminator's final conv, as torchgan does with
    #: last_nonlinearity=LeakyReLU(0.2) (reference histopathology_gan.py:191).
    disc_last_leaky: bool = True
    #: condgan/biggan (reference histopathology_gan.py:261-263 and the biggan
    #: wiring's n_classes=2 at :224). biggan with 0 runs unconditionally.
    num_classes: int = 0
    #: sagan/biggan: feature-map resolution that gets a self-attention block
    #: (both nets). SAGAN's paper places it mid-stack; BigGAN-256 uses 64.
    attn_size: int = 32
    #: biggan: shared class-embedding width fed to conditional BN.
    embed_dim: int = 128
    #: biggan: rematerialize (jax.checkpoint) each residual block so the
    #: WGAN-GP double-backward recomputes block activations instead of
    #: holding them. BigGAN-256's 16x-wider channel taper at batch 32 needs
    #: more HBM than a v5e chip has without this (the round-4 TPU-worker
    #: crash — docs/perf/biggan_rootcause.json); remat trades ~1/3 extra
    #: FLOPs for an activation footprint that fits.
    remat: bool = False
    batchnorm: bool = True
    #: critic conditioning. "unconditional" = the reference's critic, which
    #: sees only images — compute_representation.py's identity-transfer goal
    #: gives the critic no gradient toward patient identity (the structural
    #: cause diagnosed in docs/quality/REPRESENTATION.md). "projection" =
    #: Miyato & Koyama (arXiv:1802.05637) projection conditioning on the
    #: frozen VAE encoding z_mean: score = psi(phi(x)) + <W z_mean, sumpool
    #: phi(x)>. Our extension (wganvae only); one extra matmul per D call.
    critic: str = "unconditional"
    compute_dtype: str = "bfloat16"
    #: compute schedule for the generator's stride-2 4x4 up-convs:
    #: 'xla' = nn.ConvTranspose (lhs_dilation lowering), 'd2s' = phase-
    #: decomposed stride-1 conv + depth-to-space (same math, same param tree,
    #: no zero-stuffing work on the MXU — models/dcgan.ConvT4x4s2D2S).
    convt_impl: str = "xla"


@dataclass(frozen=True)
class GANConfig:
    """GAN training run (reference ``histopathology_gan.py`` CLI + literals)."""

    model: GANModelConfig = field(default_factory=GANModelConfig)
    loss_type: str = "wganvae"  # minimax | wgan | wganvae | lsgan
    batch_size: int = 8  # hardcoded in the reference (histopathology_gan.py:94)
    num_epochs: int = 900
    # TTUR Adam (reference histopathology_gan.py:252,257)
    g_lr: float = 1e-4
    d_lr: float = 4e-4
    adam_b1: float = 0.5
    adam_b2: float = 0.999
    # wgan weight clip (reference histopathology_gan.py:270)
    clip: Optional[Tuple[float, float]] = (-0.01, 0.01)
    gp_lambda: float = 10.0  # reference wgan_loss.py:287
    noise_range: float = 0.3  # U(-0.3, 0.3) infusion noise, wgan_loss.py:100
    #: frozen betaVAE encoder used by the wganvae loss family
    #: (reference wgan_loss.py:67-69, hardcoded path histopathology_gan.py:275-278).
    vae_checkpoint: Optional[str] = None
    vae: VAEModelConfig = field(default_factory=VAEModelConfig)
    #: reference quirk compatibility: scalar (not per-sample) interpolation
    #: epsilon (wgan_loss.py:376) and a *global* gradient 2-norm in the penalty
    #: (wgan_loss.py:43), plus separate D-loss and GP optimizer steps as
    #: torchgan's Trainer runs each loss's train_ops independently.
    compat_reference_gp: bool = False
    #: performance mode: evaluate D on real and fake as ONE 2B-batch dispatch
    #: in the critic loss (vmap over a [real; fake] group axis — fewer
    #: launches, better MXU utilization). Exactly equivalent to the two-pass
    #: step including batchnorm: per-group batch statistics plus a closed-form
    #: recomposition of the sequential running-stats update (tested).
    fused_critic_batch: bool = False
    #: critic iterations per generator update (WGAN n_critic; arXiv:1701.07875
    #: trains 5 critic steps per G step). The reference's torchgan Trainer
    #: runs 1:1, so 1 is the parity default. With n_critic > 1, every step
    #: still updates D (+GP) on its own fresh batch; the G update runs on
    #: every n_critic-th step only.
    n_critic: int = 1
    #: dtype for Adam's first-moment accumulators ("bfloat16" halves that
    #: slice of the per-step optimizer HBM traffic — the batch-INDEPENDENT
    #: floor the stage profile isolates as `adam_updates`; see docs/PERF.md).
    #: The second moment stays float32: its EMA increment is (1-b2)=1e-3 of
    #: the running value, below bf16's 8-bit mantissa, so a bf16 nu would
    #: stop accumulating. mu's increment is (1-b1)=0.5 — safe in bf16.
    #: None keeps the exact float32 reference dynamics.
    adam_mu_dtype: Optional[str] = None
    #: exponential moving average of the generator weights (e.g. 0.999).
    #: A standard GAN quality lever the reference lacks: the EMA generator
    #: averages out the D/G oscillation and typically reaches a given FID in
    #: fewer epochs than the raw weights. Tracked as ``GANTrainState.g_ema``
    #: (updated only on steps where G itself updates, so the average is over
    #: the G-update sequence and invariant to ``n_critic``); sampling and the
    #: in-training FID probe use it automatically when enabled. None (default)
    #: disables it — exact reference dynamics and state layout.
    g_ema_decay: Optional[float] = None
    sample_size: int = 64  # per-epoch sample grid (histopathology_gan.py:300)
    seed: int = 99
    mesh: MeshConfig = field(default_factory=MeshConfig)


@dataclass(frozen=True)
class DataConfig:
    """Data-layer knobs shared by the training CLIs
    (reference JSON keys, SURVEY.md section 5.6)."""

    path_csv: Tuple[str, ...] = ()
    patch_data_path: Tuple[str, ...] = ()
    img_size: int = 256
    max_patch_per_wsi: int = 400
    rna_features: int = 19198
    bag_size: int = 40
    n_workers: int = 4
    quick: bool = False
    normalizer: str = "standard"  # standard | minmax (read_data.py:488-495)


def load_reference_json(path: str) -> Dict[str, Any]:
    """Load one of the reference's JSON config files verbatim.

    Keys per reference ``configs/betavae_tissues.json:1-23``: path_csv,
    patch_data_path, img_size, max_patch_per_wsi, rna_features, weights_decay,
    lr, num_epochs, n_workers, device, flag, save_dir, summary_path,
    log_interval, bag_size, batch_size, beta, quick, optimizer,
    encoder_checkpoint.
    """
    with open(path) as f:
        return json.load(f)


def vae_config_from_json(raw: Dict[str, Any]) -> "VAEConfig":
    """Build a :class:`VAEConfig` from a reference-format JSON dict
    (mirrors the reads at reference ``betaVAE_training.py:53-59``)."""
    model = VAEModelConfig(
        rna_features=int(raw.get("rna_features", 19198)),
        beta=float(raw.get("beta", 0.0005)),
        # extension keys (absent from reference configs, which hardcode the
        # architecture in code — betaVAE_training.py:136)
        z_dim=int(raw.get("z_dim", 2048)),
        encoder_dims=tuple(raw.get("encoder_dims", (6000, 4000, 2048))),
        decoder_dims=tuple(raw.get("decoder_dims", (4000, 6000))),
    )
    return VAEConfig(
        model=model,
        lr=float(raw.get("lr", 5e-5)),
        weight_decay=float(raw.get("weights_decay", 0.0)),
        optimizer=str(raw.get("optimizer", "adam")),
        batch_size=int(raw.get("batch_size", 128)),
        num_epochs=int(raw.get("num_epochs", 500)),
        log_interval=int(raw.get("log_interval", 100)),
    )


def data_config_from_json(raw: Dict[str, Any], num_patches: Optional[int] = None) -> "DataConfig":
    return DataConfig(
        path_csv=tuple(raw.get("path_csv", ())),
        patch_data_path=tuple(raw.get("patch_data_path", ())),
        img_size=int(raw.get("img_size", 256)),
        max_patch_per_wsi=int(num_patches if num_patches is not None else raw.get("max_patch_per_wsi", 400)),
        rna_features=int(raw.get("rna_features", 19198)),
        bag_size=int(raw.get("bag_size", 40)),
        n_workers=int(raw.get("n_workers", 4)),
        quick=bool(raw.get("quick", False)),
    )


def to_json(cfg) -> str:
    return json.dumps(_asdict(cfg), indent=2, default=str)
