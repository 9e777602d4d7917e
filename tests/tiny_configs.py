"""Small configs for fast CPU tests."""
from sgv3d_tpu.config import BackboneConfig, ExpConfig, HeadConfig, Task

TINY_TASKS = (Task(("car",)), Task(("pedestrian", "cyclist")))
TINY_CLASSES = ("car", "pedestrian", "cyclist")


def tiny_backbone(is_bsm=False):
    return BackboneConfig(
        x_bound=(0.0, 25.6, 1.6),
        y_bound=(-12.8, 12.8, 1.6),
        z_bound=(-5.0, 3.0, 8.0),
        d_bound=(-2.0, 3.5, 8),
        final_dim=(64, 96),
        output_channels=16,
        downsample_factor=16,
        resnet_depth=18,
        img_neck_out_channels=(8, 8, 8, 8),
        height_net_mid_channels=(32, 16),
        semantic_channels=4,
        is_bsm=is_bsm,
    )


def tiny_head(is_bsm=False):
    bev_in = 16 + (4 if is_bsm else 0)
    return HeadConfig(
        tasks=TINY_TASKS,
        in_channels=32,
        bev_backbone_in_channels=bev_in,
        bev_backbone_base_channels=16,
        bev_neck_out_channels=(8, 8, 8, 8),
        bev_neck_upsample_strides=(1, 2, 4, 8),
        share_conv_channels=16,
        point_cloud_range=(0, -12.8, -5, 25.6, 12.8, 3),
        grid_size=(64, 64, 1),
        voxel_size=(0.4, 0.4, 8),
        out_size_factor=4,
        max_objs=20,
        post_center_range=(-5.0, -20.0, -10.0, 30.0, 20.0, 10.0),
        max_per_task=32,
        nms_min_radius=(4.0, 0.5),
        post_max_size=10,
    )


def tiny_exp(is_bsm=False):
    return ExpConfig(
        name="tiny_bsm" if is_bsm else "tiny",
        backbone=tiny_backbone(is_bsm),
        head=tiny_head(is_bsm),
        classes=TINY_CLASSES,
        is_train_height=True,
    )
