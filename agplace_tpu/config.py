"""Frozen configuration system for the TPU-native AGPlace framework.

The reference (sijieaaa/AGPlace) uses a ~150-flag argparse monolith that every
module re-parses at import time (``/root/reference/tools/options.py:11-375``),
making flags process-global mutable state.  Here the whole configuration is a
tree of frozen dataclasses resolved exactly once; shape-affecting fields are
static (hashable) so they can parameterise ``jax.jit`` without retraces.

Field names intentionally mirror the reference flags (``--mm_imgfe_layers`` ->
``MMConfig.imgfe_layers``) so behaviour parity is auditable flag-by-flag.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


def _tuple_int(spec: str) -> Tuple[int, ...]:
    return tuple(int(x) for x in spec.split("_"))


def _tuple_str(spec: str) -> Tuple[str, ...]:
    return tuple(spec.split("_"))


@dataclass(frozen=True)
class DataConfig:
    """Dataset / input-pipeline configuration.

    Mirrors reference flags in ``tools/options.py:19-72`` plus the fixed-shape
    padding knobs the TPU build needs (the reference used variable-size ME
    sparse tensors; we pad to ``vox_max_points``).
    """

    dataset: str = "kitti360"  # kitti360 | nuscenes | synthetic
    dataroot: str = ""
    maptype: Tuple[str, ...] = ("satellite",)  # satellite/roadmap/terrain/hybrid
    camnames: Tuple[str, ...] = ("00",)  # kitti360: 00|0203; nuscenes: fl_f_fr_bl_b_br
    traindownsample: int = 4
    train_ratio: float = 0.85

    # geometry thresholds (metres, UTM)
    val_positive_dist_threshold: float = 25.0  # soft positives (eval GT)
    train_positives_dist_threshold: float = 10.0  # hard positives (mining)

    # image sizes / transforms
    q_resize: int = 256
    db_cropsize: int = 256
    db_resize: int = 256
    q_jitter: float = 0.0
    db_jitter: float = 0.0
    color_jitter: float = 0.0
    # per-dataset normalisation: kitti360 uses mean .5/std .22
    # (datasets_ws_kitti360.py:244), nuscenes uses ImageNet stats
    # (datasets_ws_nuscenes.py:293).
    norm_mean: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    norm_std: Tuple[float, float, float] = (0.22, 0.22, 0.22)
    nuscenes_cam_resize: int = 192  # datasets_ws_nuscenes.py:608

    # point-cloud voxelisation (reference: ME.sparse_quantize, quant_size=2)
    read_pc: bool = True
    quant_size: float = 2.0
    vox_max_points: int = 8192  # static padding capacity (TPU fixed shapes)
    pc_rot_aug_deg: float = 5.0  # collate-time +-5 deg z-rotation
    # (kitti360:120-126)

    # spherical / BEV projections (ALT paths, kitti360:286-353)
    sph_size: int = 32
    sph_jit: float = 0.2
    bev_jit: float = 0.2

    num_workers: int = 8

    @property
    def nmap(self) -> int:
        return len(self.maptype)

    @property
    def ncam(self) -> int:
        return len(self.camnames)


@dataclass(frozen=True)
class ODEConfig:
    """Neural-ODE integrator settings (reference: torchdiffeq odeint calls at
    ``network_mm/ffns.py:84`` with flags ``tools/options.py:130-138``)."""

    diff_type: str = "fcode@relu"  # '_'-separated blocks of kind@activation
    diff_direction: str = "backward"  # scale traversal order in stage-1 fusion
    method: str = "euler"  # euler | midpoint | rk4 | dopri5
    step_size: float = 0.1  # fixed-step integrators: 10 steps over t in [0,1]
    rtol: float = 1e-3
    atol: float = 1e-3
    dopri5_max_steps: int = 64  # static bound for the adaptive integrator
    use_pallas: bool = True  # fused VMEM-resident Euler chain on TPU


@dataclass(frozen=True)
class MMConfig:
    """Ground/query tower (reference ``network_mm/mm.py:31`` + flags
    ``tools/options.py:100-156``)."""

    imgfe: str = "resnet18"
    imgfe_layers: Tuple[int, ...] = (2, 2, 2)
    imgfe_planes: Tuple[int, ...] = (64, 128, 256)
    imgfe_dim: int = 256
    voxfe_layers: Tuple[int, ...] = (1, 1, 1)
    voxfe_planes: Tuple[int, ...] = (64, 128, 256)
    voxfe_ntd: int = 0  # num_top_down in MinkFPN
    voxfe_dim: int = 256
    # voxel-branch execution backend: "dense" = masked dense-grid conv3d
    # (XLA-native, MXU near-peak; exactly equivalent, see sparse/dense_grid);
    # "sparse" = padded gather-GEMM (for clouds exceeding the grid extent)
    voxfe_backend: str = "dense"
    # LiDAR clouds are flat: z extent 8 voxels (±8 m at quant 2) covers the
    # KITTI/nuScenes vertical range; xy ±128 m
    vox_grid_extent: Tuple[int, int, int] = (128, 128, 8)
    stg2fuse_dim: int = 256
    output_type: Tuple[str, ...] = ("image", "vox", "shallow")
    output_l2: bool = True
    final_type: Tuple[str, ...] = (
        "imageorg",
        "voxorg",
        "shalloworg",
        "stg2image",
        "stg2vox",
    )
    final_fusetype: str = "add"  # add | cat | catadd
    final_l2: bool = False

    # component weights (tools/options.py:121-146); *_learnweight toggles
    # whether the scalar is trained.
    image_weight: float = 1.0
    image_learnweight: bool = False
    vox_weight: float = 1.0
    vox_learnweight: bool = False
    shallow_weight: float = 1.0
    shallow_learnweight: bool = False
    imagevoxorg_weight: float = 0.0
    imagevoxorg_learnweight: bool = False
    shalloworg_weight: float = 1.0
    shalloworg_learnweight: bool = False
    stg2imagevox_weight: float = 0.1
    stg2imagevox_learnweight: bool = False
    stg2fuse_weight: float = 0.0
    stg2fuse_learnweight: bool = False

    ode: ODEConfig = field(default_factory=ODEConfig)

    # stage-2 fusion block (tools/options.py:148-155)
    stg2gnn: str = "qkv"  # qkv | beltrami (graph-ODE variants)
    beltrami_k: int = 16
    stg2nlayers: int = 1
    stg2fuse_type: str = "basic"
    stg2_type: str = "full"
    stg2_useproj: bool = True

    drop: Optional[str] = None  # modality-drop ablation: 'image' | 'pc'


@dataclass(frozen=True)
class DBConfig:
    """Aerial/database tower (reference ``models_baseline/dbvanilla2d.py:31``)."""

    modeldb: str = "vanilla2d"
    image_fe: str = "resnet18"
    image_fe_layers: Tuple[int, ...] = (2, 2, 2)
    share_dbfe: bool = False  # share one backbone across map types


@dataclass(frozen=True)
class ModelConfig:
    modelq: str = "mm"  # query-tower family
    features_dim: int = 256
    mm: MMConfig = field(default_factory=MMConfig)
    db: DBConfig = field(default_factory=DBConfig)
    # aggregation head for the DVGLB-style GeoLocalizationNet family
    # (reference model/network.py) — gem|netvlad|spoc|mac|rmac|crn|rrm|...
    backbone: str = "resnet18conv4"
    aggregation: str = "gem"
    netvlad_clusters: int = 64
    fc_output_dim: Optional[int] = None
    l2: str = "before_pool"  # before_pool | after_pool | none
    # numerics
    compute_dtype: str = "float32"  # float32 | bfloat16 (activations)
    # pretrained backbone init (reference: torchvision pretrained resnets in
    # both towers, network_mm/image_fe.py:19,33).  Sources tried in order:
    # pretrained_path (file or dir of {arch}*.pth), $AGPLACE_WEIGHTS,
    # ~/.cache/agplace_tpu/weights, <repo>/weights, torchvision zoo.  Falls
    # back to random init with a logged warning when none exists.
    pretrained: bool = True
    pretrained_path: Optional[str] = None


@dataclass(frozen=True)
class LossConfig:
    criterion: str = "triplet"  # triplet | sare_ind | sare_joint
    margin: float = 0.1  # tools/options.py:169
    tripletloss_weight: float = 1.0
    otherloss_type: str = "bce"  # bce | mse | l1
    otherloss_weight: float = 0.01
    infonceloss_weight: float = 0.0
    mm_lossweight: Tuple[float, ...] = (1.0, 0.0, 0.0)  # final/cloud/image


@dataclass(frozen=True)
class TrainConfig:
    epochs_num: int = 100
    train_batch_size: int = 16  # triplets per step (each = 12 samples)
    infer_batch_size: int = 32
    queries_per_epoch: int = 16000
    cache_refresh_rate: int = 4000
    neg_samples_num: int = 1000  # negative candidate pool per refresh
    negs_num_per_query: int = 10
    mining: str = "partial_sep"  # partial | partial_sep | full | random
    # optimizer (two Adams in the reference, train.py:213-214; here one
    # labelled optax partition with the same per-group LRs)
    optim: str = "adam"
    lr: float = 1e-5  # image branch + fusion
    lrpc: float = 1e-4  # voxel branch
    lrdb: float = 1e-5  # aerial tower
    seed: int = 0
    patience: int = 50
    train_modelq: bool = True
    train_modeldb: bool = True
    save_dir: str = "logs/default"
    resume: Optional[str] = None
    checkpoint_every_epochs: int = 1
    checkpoint_after_epoch: int = 40  # reference saves only for epoch>40
    profile_steps: int = 0  # >0: capture a jax.profiler trace of N steps
    loss: LossConfig = field(default_factory=LossConfig)


@dataclass(frozen=True)
class EvalConfig:
    recall_values: Tuple[int, ...] = (1, 5, 10, 20)
    test_method: str = "hard_resize"
    # hard_resize | single_query | central_crop | five_crops | nearest_crop
    # | maj_voting
    majority_weight: float = 0.01
    pca_dim: Optional[int] = None


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout.  The reference has no multi-device story beyond
    single-process DataParallel+SyncBN (SURVEY.md §2.5); here parallelism is a
    first-class mesh: ``data`` shards the batch (DP, BN stats pmean'd over it)
    and ``gallery`` shards the retrieval database for 100k+ tile galleries."""

    data_axis: str = "data"
    gallery_axis: str = "gallery"
    data_parallel: int = -1  # -1 = use all devices
    gallery_parallel: int = 1


@dataclass(frozen=True)
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    exp_name: str = "default"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Presets mirroring the reference run commands (README.md:76-80)
# ---------------------------------------------------------------------------

def kitti360_config() -> Config:
    """``python train.py --dataset kitti360 --camnames 00 --epochs_num 40``."""
    return Config(
        data=DataConfig(dataset="kitti360", camnames=("00",)),
        train=dataclasses.replace(TrainConfig(), epochs_num=40),
        exp_name="kitti360_00",
    )


def nuscenes_config() -> Config:
    """``python train.py --dataset nuscenes --camnames fl_f_fr_bl_b_br``."""
    return Config(
        data=DataConfig(
            dataset="nuscenes",
            camnames=("fl", "f", "fr", "bl", "b", "br"),
            norm_mean=(0.485, 0.456, 0.406),
            norm_std=(0.229, 0.224, 0.225),
        ),
        train=dataclasses.replace(TrainConfig(), epochs_num=100),
        exp_name="nuscenes_6cam",
    )


def synthetic_config(
    batch_size: int = 4,
    image_size: int = 64,
    vox_max_points: int = 512,
    negs: int = 2,
) -> Config:
    """Small config for CI / smoke tests on CPU-JAX."""
    return Config(
        model=ModelConfig(
            mm=dataclasses.replace(MMConfig(),
                                   vox_grid_extent=(32, 32, 16)),
        ),
        data=DataConfig(
            dataset="synthetic",
            q_resize=image_size,
            db_resize=image_size,
            db_cropsize=image_size,
            vox_max_points=vox_max_points,
        ),
        train=dataclasses.replace(
            TrainConfig(),
            train_batch_size=batch_size,
            infer_batch_size=batch_size,
            negs_num_per_query=negs,
            queries_per_epoch=4 * batch_size,
            cache_refresh_rate=2 * batch_size,
            neg_samples_num=4 * batch_size,
            epochs_num=1,
        ),
        exp_name="synthetic",
    )


# ---------------------------------------------------------------------------
# CLI: same surface as the reference's argparse (subset that is live), but
# resolving into the frozen dataclass tree instead of a global namespace.
# ---------------------------------------------------------------------------

def parse_arguments(argv=None) -> Config:
    p = argparse.ArgumentParser(
        description="TPU-native aerial-ground place recognition",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("--dataset", default="kitti360",
                   choices=["kitti360", "nuscenes", "synthetic"])
    p.add_argument("--dataroot", default="")
    p.add_argument("--maptype", default="satellite")
    p.add_argument("--camnames", default=None,
                   help="kitti360: 00|0203; nuscenes: fl_f_fr_bl_b_br")
    p.add_argument("--epochs_num", type=int, default=None)
    p.add_argument("--train_batch_size", type=int, default=16)
    p.add_argument("--infer_batch_size", type=int, default=32)
    p.add_argument("--queries_per_epoch", type=int, default=16000)
    p.add_argument("--cache_refresh_rate", type=int, default=4000)
    p.add_argument("--negs_num_per_query", type=int, default=10)
    p.add_argument("--neg_samples_num", type=int, default=1000)
    p.add_argument("--mining", default="partial_sep",
                   choices=["partial", "partial_sep", "full", "random"])
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--lrpc", type=float, default=1e-4)
    p.add_argument("--lrdb", type=float, default=1e-5)
    p.add_argument("--margin", type=float, default=0.1)
    p.add_argument("--criterion", default="triplet",
                   choices=["triplet", "sare_ind", "sare_joint"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", default=None)
    p.add_argument("--save_dir", default="logs/default")
    p.add_argument("--features_dim", type=int, default=256)
    p.add_argument("--odeint_method", default="euler")
    p.add_argument("--odeint_size", type=float, default=0.1)
    p.add_argument("--output_type", default="image_vox_shallow")
    p.add_argument("--final_type",
                   default="imageorg_voxorg_shalloworg_stg2image_stg2vox")
    p.add_argument("--quant_size", type=float, default=2.0)
    p.add_argument("--vox_max_points", type=int, default=8192)
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    args = p.parse_args(argv)

    if args.dataset == "nuscenes":
        cfg = nuscenes_config()
    elif args.dataset == "synthetic":
        cfg = synthetic_config()
    else:
        cfg = kitti360_config()

    camnames = (
        _tuple_str(args.camnames) if args.camnames else cfg.data.camnames
    )
    data = dataclasses.replace(
        cfg.data,
        dataroot=args.dataroot,
        maptype=_tuple_str(args.maptype),
        camnames=camnames,
        quant_size=args.quant_size,
        vox_max_points=args.vox_max_points,
    )
    train = dataclasses.replace(
        cfg.train,
        epochs_num=args.epochs_num or cfg.train.epochs_num,
        train_batch_size=args.train_batch_size,
        infer_batch_size=args.infer_batch_size,
        queries_per_epoch=args.queries_per_epoch,
        cache_refresh_rate=args.cache_refresh_rate,
        negs_num_per_query=args.negs_num_per_query,
        neg_samples_num=args.neg_samples_num,
        mining=args.mining,
        lr=args.lr,
        lrpc=args.lrpc,
        lrdb=args.lrdb,
        seed=args.seed,
        resume=args.resume,
        save_dir=args.save_dir,
        loss=dataclasses.replace(cfg.train.loss, criterion=args.criterion,
                                 margin=args.margin),
    )
    mm = dataclasses.replace(
        cfg.model.mm,
        output_type=_tuple_str(args.output_type),
        final_type=_tuple_str(args.final_type),
        ode=dataclasses.replace(cfg.model.mm.ode, method=args.odeint_method,
                                step_size=args.odeint_size),
    )
    model = dataclasses.replace(
        cfg.model, features_dim=args.features_dim, mm=mm,
        compute_dtype=args.compute_dtype,
    )
    return dataclasses.replace(cfg, data=data, train=train, model=model)
