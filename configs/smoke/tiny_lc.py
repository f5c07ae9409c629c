# Tiny L+C config for CLI smoke tests (CPU-friendly shapes).
max_epochs = 1
samples_per_gpu = 1
point_cloud_range = [-9.6, -9.6, -2.0, 9.6, 9.6, 2.0]
voxel_size = [0.6, 0.6, 4.0 / 24]
class_names = ['car', 'truck', 'trailer', 'bus', 'construction_vehicle',
               'bicycle', 'motorcycle', 'pedestrian', 'traffic_cone', 'barrier']
input_modality = dict(use_lidar=True, use_camera=True, use_radar=False,
                      use_map=False, use_external=False)
_dim_ = 32

data = dict(samples_per_gpu=1, workers_per_gpu=0,
            train=dict(type='SyntheticNuScenes', length=2, num_cams=2,
                       img_hw=(64, 96), max_points=1024, max_gt=8),
            val=None,
            test=dict(type='SyntheticNuScenes', length=2, num_cams=2,
                      img_hw=(64, 96), max_points=1024, max_gt=8))

model = dict(
    type='UniBEV', use_grid_mask=True, img_shape=(64, 96),
    pts_voxel_layer=dict(max_num_points=5, voxel_size=voxel_size,
                         point_cloud_range=point_cloud_range,
                         max_voxels=(2000, 2000)),
    pts_voxel_encoder=dict(type='HardSimpleVFE', num_features=5),
    pts_middle_encoder=dict(type='SparseEncoder', in_channels=5,
                            sparse_shape=[25, 32, 32], output_channels=32,
                            encoder_channels=((8, 8, 16), (16, 16, 32),
                                              (32, 32, 32), (32, 32)),
                            encoder_paddings=((0, 0, 1), (0, 0, 1),
                                              (0, 0, [0, 1, 1]), (0, 0)),
                            capacities=(2000, 1500, 1000, 800)),
    pts_backbone=dict(type='SECOND', in_channels=32, out_channels=[32, 64],
                      layer_nums=[1, 1], layer_strides=[1, 2]),
    pts_neck=dict(type='SECONDFPN', in_channels=[32, 64],
                  out_channels=[16, 16], upsample_strides=[1, 2]),
    img_backbone=dict(type='ResNet', depth=50, num_stages=4, out_indices=(3,),
                      style='caffe', stage_with_dcn=(False, False, False, True),
                      dcn=dict(type='DCNv2')),
    img_neck=dict(type='FPN', in_channels=[2048], out_channels=_dim_,
                  num_outs=1),
    pts_bbox_head=dict(
        type='UniBEV_Head', num_classes=10, in_channels=_dim_, num_query=24,
        bev_h=8, bev_w=8, pc_range=point_cloud_range,
        transformer=dict(
            embed_dims=_dim_, fusion_method='linear',
            feature_norm='ChannelNormWeights', drop_modality=0.5, num_cams=2,
            img_encoder=dict(num_layers=1, pc_range=point_cloud_range,
                             num_points_in_pillar=2,
                             transformerlayers=dict(
                                 attn_cfgs=[
                                     dict(embed_dims=_dim_, num_levels=1),
                                     dict(deformable_attention=dict(
                                         embed_dims=_dim_, num_points=4,
                                         num_levels=1)),
                                 ],
                                 feedforward_channels=_dim_ * 2)),
            pts_encoder=dict(num_layers=1, pc_range=point_cloud_range,
                             num_points_in_pillar_lidar=2,
                             transformerlayers=dict(
                                 attn_cfgs=[
                                     dict(embed_dims=_dim_, num_levels=1),
                                     dict(deformable_attention=dict(
                                         embed_dims=_dim_, num_points=4,
                                         num_levels=1)),
                                 ],
                                 feedforward_channels=_dim_ * 2)),
            decoder=dict(num_layers=2,
                         transformerlayers=dict(
                             attn_cfgs=[
                                 dict(embed_dims=_dim_, num_heads=4,
                                      dropout=0.1),
                                 dict(embed_dims=_dim_, num_levels=1),
                             ],
                             feedforward_channels=_dim_ * 2))),
        bbox_coder=dict(type='NMSFreeCoder',
                        post_center_range=[-12, -12, -4, 12, 12, 4],
                        pc_range=point_cloud_range, max_num=16,
                        num_classes=10),
        positional_encoding=dict(type='LearnedPositionalEncoding',
                                 num_feats=_dim_ // 2, row_num_embed=8,
                                 col_num_embed=8),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=2.0),
        loss_bbox=dict(type='L1Loss', loss_weight=0.25)),
    train_cfg=dict(pts=dict(assigner=dict(
        type='HungarianAssigner3DBEVFormer',
        cls_cost=dict(type='FocalLossCost', weight=2.0),
        reg_cost=dict(type='BBox3DL1CostBEVFormer', weight=0.25)))))

optimizer = dict(type='AdamW', lr=2e-4, weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy='CosineAnnealing', warmup='linear', warmup_iters=10,
                 warmup_ratio=1.0 / 3, min_lr_ratio=1e-3)
checkpoint_config = dict(interval=1)
log_config = dict(interval=1, hooks=[dict(type='TextLoggerHook')])
workflow = [('train', 1)]
