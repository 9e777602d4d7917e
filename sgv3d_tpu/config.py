"""Config dataclasses (python-as-config, mirroring the reference's exp-file
dict axes: resnet depth, voxel size, d_bound, range, is_bsm, aux loss).

Reference conf sites: /root/reference/exps/sgv3d/bsm_bev_height_lss_r50_864_1536_128x128.py:31-181
"""
from __future__ import annotations

import dataclasses
from sgv3d_tpu.geom import VoxelGrid


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    x_bound: tuple[float, float, float] = (0.0, 102.4, 0.8)
    y_bound: tuple[float, float, float] = (-51.2, 51.2, 0.8)
    z_bound: tuple[float, float, float] = (-5.0, 3.0, 8.0)
    d_bound: tuple[float, float, int] = (-2.0, 3.5, 90)
    final_dim: tuple[int, int] = (864, 1536)
    output_channels: int = 80
    downsample_factor: int = 16
    resnet_depth: int = 50
    img_neck_out_channels: tuple[int, ...] = (128, 128, 128, 128)
    height_net_mid_channels: tuple[int, int] = (512, 256)
    semantic_channels: int = 7
    is_bsm: bool = False
    # Deployment knob: pool only the top-k height bins per pixel (None =
    # exact, all bins). The DID softmax concentrates its mass in a few bins,
    # so k ~ 16 cuts the BEV scatter ~6x with negligible output change.
    lift_top_k: int | None = None
    # Opt-in TRAINING speed knob (None = exact, reference-parity gradients):
    # pool only the top-k height bins per pixel during training too. The
    # differentiable lax.top_k path is used, so gradients flow to the
    # selected bins (unselected bins get zero height gradient instead of the
    # exact tiny one) — a documented approximation, never on by default.
    train_lift_top_k: int | None = None
    # Rematerialize the image backbone + neck during training (activations
    # recomputed in the backward pass instead of stored). Required for the
    # heavy variants (r101 / 180 bins / 1024+ head grid) to fit one chip's
    # HBM; costs ~1/3 extra forward FLOPs.
    remat_backbone: bool = False

    @property
    def voxel_grid(self) -> VoxelGrid:
        return VoxelGrid(self.x_bound, self.y_bound, self.z_bound)

    @property
    def num_height_bins(self) -> int:
        return int(self.d_bound[2])

    @property
    def effective_downsample(self) -> int:
        """BSM lifts at half the nominal stride (stride 8 for factor 16)."""
        return self.downsample_factor // 2 if self.is_bsm else self.downsample_factor

    @property
    def feat_hw(self) -> tuple[int, int]:
        d = self.effective_downsample
        return self.final_dim[0] // d, self.final_dim[1] // d

    @property
    def resnet_out_channels(self) -> tuple[int, ...]:
        if self.resnet_depth >= 50:
            return (256, 512, 1024, 2048)
        return (64, 128, 256, 512)


@dataclasses.dataclass(frozen=True)
class Task:
    class_names: tuple[str, ...]

    @property
    def num_classes(self) -> int:
        return len(self.class_names)


DEFAULT_TASKS = (
    Task(("car",)),
    Task(("truck", "construction_vehicle")),
    Task(("bus", "trailer")),
    Task(("barrier",)),
    Task(("motorcycle", "bicycle")),
    Task(("pedestrian", "traffic_cone")),
)

DEFAULT_CLASSES = (
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
)


@dataclasses.dataclass(frozen=True)
class HeadConfig:
    tasks: tuple[Task, ...] = DEFAULT_TASKS
    in_channels: int = 256
    bev_backbone_in_channels: int = 80   # 87 for BSM (80 ctx + 7 semantic)
    bev_backbone_base_channels: int = 160  # 174 for BSM
    bev_neck_out_channels: tuple[int, ...] = (64, 64, 64, 64)
    bev_neck_upsample_strides: tuple[float, ...] = (1, 2, 4, 8)
    common_heads: tuple[tuple[str, tuple[int, int]], ...] = (
        ("reg", (2, 2)), ("height", (1, 2)), ("dim", (3, 2)),
        ("rot", (2, 2)), ("vel", (2, 2)),
    )
    share_conv_channels: int = 64
    init_bias: float = -2.19
    final_kernel: int = 3
    # train_cfg
    point_cloud_range: tuple[float, ...] = (0, -51.2, -5, 102.4, 51.2, 3)
    grid_size: tuple[int, int, int] = (512, 512, 1)
    voxel_size: tuple[float, float, float] = (0.2, 0.2, 8)
    out_size_factor: int = 4
    gaussian_overlap: float = 0.1
    max_objs: int = 500
    min_radius: int = 2
    code_weights: tuple[float, ...] = (1., 1., 1., 1., 1., 1., 1., 1., .5, .5)
    loss_bbox_weight: float = 0.25
    # test_cfg
    post_center_range: tuple[float, ...] = (0.0, -61.2, -10.0, 122.4, 61.2, 10.0)
    max_per_task: int = 500
    score_threshold: float = 0.1
    nms_min_radius: tuple[float, ...] = (4, 12, 10, 1, 0.85, 0.175)
    post_max_size: int = 83

    @property
    def feature_map_size(self) -> tuple[int, int]:
        return (self.grid_size[0] // self.out_size_factor,
                self.grid_size[1] // self.out_size_factor)

    @property
    def num_tasks(self) -> int:
        return len(self.tasks)


@dataclasses.dataclass(frozen=True)
class ExpConfig:
    """One experiment = one reference exp file."""
    name: str
    backbone: BackboneConfig
    head: HeadConfig
    classes: tuple[str, ...] = DEFAULT_CLASSES
    is_train_height: bool = True
    # schedule
    max_epochs: int = 20
    basic_lr_per_img: float = 2e-4 / 64
    weight_decay: float = 1e-7
    lr_milestones: tuple[int, ...] = (19, 23)
    grad_clip: float = 5.0
    batch_size_per_device: int = 2
    semantic_loss_weight: float = 500.0
    # data
    data_root: str = "data/rope3d-kitti"
    img_mean: tuple[float, float, float] = (123.675, 116.28, 103.53)
    img_std: tuple[float, float, float] = (58.395, 57.12, 57.375)
    # ida_aug_conf (reference keeps it per exp, exps/...:74-84); source image
    # size + bottom-crop limits for the resize/crop augmentation.
    src_hw: tuple[int, int] = (1080, 1920)
    bot_pct_lim: tuple[float, float] = (0.0, 0.0)
    cams: tuple[str, ...] = ("CAM_FRONT",)

    @property
    def ida_aug_conf(self) -> dict:
        return {"final_dim": self.backbone.final_dim,
                "H": self.src_hw[0], "W": self.src_hw[1],
                "bot_pct_lim": self.bot_pct_lim,
                "cams": list(self.cams), "Ncams": len(self.cams)}
