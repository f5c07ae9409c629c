# UniBEV_CNW: LiDAR+camera training with Channel Normalized Weights fusion,
# dim 256, modality dropout p=0.5.  Mirrors the reference config surface
# (/root/reference/projects/UniBEV/configs/unibev/
# unibev_nus_LC_cnw_256_modality_dropout.py) on the unibev_tpu stack.

eval_interval = 1
samples_per_gpu = 1
workers_per_gpu = 2
max_epochs = 36
save_interval = 6
log_interval = 10
fusion_method = 'linear'
feature_norm = 'ChannelNormWeights'
modality_dropout_prob = 0.5

dataset_type = 'NuScenesDataset'
data_root = 'data/nuscenes/'
train_ann_file = 'nuscenes_infos_train.json'
val_ann_file = 'nuscenes_infos_val.json'
work_dir = './outputs/train/unibev_cnw_dim_256_nus_LC_full'

load_from = None
resume_from = None

point_cloud_range = [-54, -54, -5, 54, 54, 3]
voxel_size = [0.075, 0.075, 0.2]
class_names = [
    'car', 'truck', 'trailer', 'bus', 'construction_vehicle', 'bicycle',
    'motorcycle', 'pedestrian', 'traffic_cone', 'barrier'
]
input_modality = dict(
    use_lidar=True, use_camera=True, use_radar=False,
    use_map=False, use_external=False)

img_scale = (1600, 900)
_dim_ = 256
_pos_dim_ = _dim_ // 2
_ffn_dim_ = _dim_ * 2
dec_scale_factor = 2 if fusion_method == 'cat' else 1
_encoder_layers_ = 3
_num_levels_ = 1
_num_points_in_pillar_cam_ = 4
_num_points_in_pillar_lidar_ = 4
bev_h_ = 200
bev_w_ = 200
img_norm_cfg = dict(mean=[103.530, 116.280, 123.675], std=[1.0, 1.0, 1.0],
                    to_rgb=False)

# Static padding sizes (TPU: every array in the batch has a fixed shape).
max_points = 300000
max_gt = 140
max_voxels_train = 90000
max_voxels_test = 120000

runner = dict(type='EpochBasedRunner', max_epochs=max_epochs)

train_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=5, use_dim=5),
    dict(type='LoadPointsFromMultiSweeps', sweeps_num=10,
         use_dim=[0, 1, 2, 3, 4], pad_empty_sweeps=True, remove_close=True),
    dict(type='LoadAnnotations3D', with_bbox_3d=True, with_label_3d=True),
    dict(type='LoadMultiViewImageFromFiles', to_float32=True),
    dict(type='PhotoMetricDistortionMultiViewImage'),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectNameFilter', classes=class_names),
    dict(type='PointShuffle'),
    dict(type='NormalizeMultiviewImage', **img_norm_cfg),
    dict(type='PadMultiViewImage', size_divisor=32),
    dict(type='DefaultFormatBundle3D', class_names=class_names),
    dict(type='CustomCollect3D', keys=['points', 'img', 'gt_bboxes_3d',
                                       'gt_labels_3d'])
]
test_pipeline = [
    dict(type='LoadPointsFromFile', coord_type='LIDAR', load_dim=5, use_dim=5),
    dict(type='LoadPointsFromMultiSweeps', sweeps_num=10,
         use_dim=[0, 1, 2, 3, 4], pad_empty_sweeps=True, remove_close=True),
    dict(type='LoadMultiViewImageFromFiles', to_float32=True),
    dict(type='NormalizeMultiviewImage', **img_norm_cfg),
    dict(type='PadMultiViewImage', size_divisor=32),
    dict(type='DefaultFormatBundle3D', class_names=class_names,
         with_label=False),
    dict(type='CustomCollect3D', keys=['points', 'img'])
]

data = dict(
    samples_per_gpu=samples_per_gpu,
    workers_per_gpu=workers_per_gpu,
    train=dict(type=dataset_type, data_root=data_root,
               ann_file=train_ann_file, pipeline=train_pipeline,
               classes=class_names, modality=input_modality,
               test_mode=False, use_valid_flag=True,
               box_type_3d='LiDAR',
               max_points=max_points, max_gt=max_gt),
    val=dict(type=dataset_type, data_root=data_root, ann_file=val_ann_file,
             pipeline=test_pipeline, classes=class_names,
             modality=input_modality, test_mode=True,
             box_type_3d='LiDAR', max_points=max_points, max_gt=max_gt),
    test=dict(type=dataset_type, data_root=data_root, ann_file=val_ann_file,
              pipeline=test_pipeline, classes=class_names,
              modality=input_modality, test_mode=True,
              box_type_3d='LiDAR', max_points=max_points, max_gt=max_gt))

model = dict(
    type='UniBEV',
    use_grid_mask=True,
    img_shape=(900, 1600),
    # TPU-critical knobs — the config-built model IS the benched model
    # (unibev_tpu/flagship.py builds this same dict; test_configs asserts it):
    # bf16 compute everywhere outside the force-fp32 zones, per-camera
    # top-K SCA rebatch (the sca_topk_overflow intermediate must stay 0),
    # and query chunking for the deformable-attention sampling matrices.
    dtype='bfloat16',
    pts_voxel_layer=dict(
        max_num_points=10, voxel_size=voxel_size,
        point_cloud_range=point_cloud_range,
        max_voxels=(max_voxels_train, max_voxels_test)),
    pts_voxel_encoder=dict(type='HardSimpleVFE', num_features=5),
    pts_middle_encoder=dict(
        type='SparseEncoder', in_channels=5, sparse_shape=[41, 1440, 1440],
        output_channels=128, order=('conv', 'norm', 'act'),
        encoder_channels=((16, 16, 32), (32, 32, 64), (64, 64, 128),
                          (128, 128)),
        encoder_paddings=((0, 0, 1), (0, 0, 1), (0, 0, [0, 1, 1]), (0, 0)),
        block_type='basicblock',
        capacities=(120000, 90000, 60000, 40000)),
    pts_backbone=dict(
        type='SECOND', in_channels=256, out_channels=[128, 256],
        layer_nums=[5, 5], layer_strides=[1, 2]),
    pts_neck=dict(
        type='SECONDFPN', in_channels=[128, 256], upsample_strides=[1, 2],
        out_channels=[_dim_ // 2, _dim_ // 2], use_conv_for_no_stride=True),
    img_backbone=dict(
        type='ResNet', depth=101, num_stages=4, out_indices=(3,),
        frozen_stages=1, style='caffe', with_cp=True,
        dcn=dict(type='DCNv2', deform_groups=1, fallback_on_stride=False),
        stage_with_dcn=(False, False, True, True)),
    img_neck=dict(
        type='FPN', in_channels=[2048], out_channels=_dim_, start_level=0,
        add_extra_convs='on_output', num_outs=_num_levels_,
        relu_before_extra_convs=True),
    pts_bbox_head=dict(
        type='UniBEV_Head', bev_h=bev_h_, bev_w=bev_w_, num_query=900,
        num_classes=10, in_channels=_dim_, sync_cls_avg_factor=True,
        with_box_refine=True, as_two_stage=False,
        query_chunk=10000,
        pc_range=point_cloud_range,
        transformer=dict(
            type='UniBEVTransformer',
            embed_dims=_dim_,
            num_cams=6,
            fusion_method=fusion_method,
            drop_modality=modality_dropout_prob,
            feature_norm=feature_norm,
            img_encoder=dict(
                type='ImgEncoder', num_layers=_encoder_layers_,
                pc_range=point_cloud_range,
                num_points_in_pillar=_num_points_in_pillar_cam_,
                return_intermediate=False,
                transformerlayers=dict(
                    type='ImgLayer',
                    attn_cfgs=[
                        dict(type='MultiScaleDeformableAttention',
                             embed_dims=_dim_, num_levels=1),
                        dict(type='SpatialCrossAttentionImg',
                             pc_range=point_cloud_range,
                             # measured per-camera hit-count max ~10000
                             # (wide rear cam); 10240 = 80*128 lanes
                             rebatch_k=10240,
                             deformable_attention=dict(
                                 type='MSDeformableAttention3DImg',
                                 embed_dims=_dim_, num_points=8,
                                 num_levels=_num_levels_),
                             embed_dims=_dim_),
                    ],
                    feedforward_channels=_ffn_dim_,
                    ffn_dropout=0.1,
                    operation_order=('self_attn', 'norm', 'cross_attn',
                                     'norm', 'ffn', 'norm'))),
            pts_encoder=dict(
                type='PtsEncoder', num_layers=_encoder_layers_,
                pc_range=point_cloud_range,
                num_points_in_pillar_lidar=_num_points_in_pillar_lidar_,
                return_intermediate=False,
                transformerlayers=dict(
                    type='PtsLayer',
                    attn_cfgs=[
                        dict(type='MultiScaleDeformableAttention',
                             embed_dims=_dim_, num_levels=1),
                        dict(type='SpatialCrossAttentionPts',
                             pc_range=point_cloud_range,
                             deformable_attention=dict(
                                 type='MSDeformableAttention3DPts',
                                 embed_dims=_dim_, num_points=8,
                                 num_levels=_num_levels_),
                             embed_dims=_dim_),
                    ],
                    feedforward_channels=_ffn_dim_,
                    ffn_dropout=0.1,
                    operation_order=('self_attn', 'norm', 'cross_attn',
                                     'norm', 'ffn', 'norm'))),
            decoder=dict(
                type='DetectionTransformerDecoder', num_layers=6,
                return_intermediate=True,
                transformerlayers=dict(
                    type='DetrTransformerDecoderLayer',
                    attn_cfgs=[
                        dict(type='MultiheadAttention',
                             embed_dims=_dim_ * dec_scale_factor,
                             num_heads=8, dropout=0.1),
                        dict(type='CustomMSDeformableAttention',
                             embed_dims=_dim_ * dec_scale_factor,
                             num_levels=1),
                    ],
                    feedforward_channels=_ffn_dim_ * dec_scale_factor,
                    ffn_dropout=0.1,
                    operation_order=('self_attn', 'norm', 'cross_attn',
                                     'norm', 'ffn', 'norm')))),
        bbox_coder=dict(
            type='NMSFreeCoder',
            post_center_range=[-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
            pc_range=point_cloud_range, max_num=300, num_classes=10),
        positional_encoding=dict(
            type='LearnedPositionalEncoding', num_feats=_pos_dim_,
            row_num_embed=bev_h_, col_num_embed=bev_w_),
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=2.0),
        loss_bbox=dict(type='L1Loss', loss_weight=0.25),
        loss_iou=dict(type='GIoULoss', loss_weight=0.0)),
    train_cfg=dict(pts=dict(
        assigner=dict(
            type='HungarianAssigner3DBEVFormer',
            cls_cost=dict(type='FocalLossCost', weight=2.0),
            reg_cost=dict(type='BBox3DL1CostBEVFormer', weight=0.25),
            iou_cost=dict(type='IoUCost', weight=0.0),
            pc_range=point_cloud_range))))

evaluation = dict(interval=eval_interval, pipeline=test_pipeline)
optimizer = dict(
    type='AdamW', lr=2e-4,
    paramwise_cfg=dict(custom_keys={
        'img_backbone': dict(lr_mult=0.1),
        'pts_backbone': dict(lr_mult=0.1),
    }),
    weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(policy='CosineAnnealing', warmup='linear', warmup_iters=500,
                 warmup_ratio=1.0 / 3, min_lr_ratio=1e-3)

total_epochs = max_epochs
checkpoint_config = dict(interval=save_interval)
log_config = dict(interval=log_interval,
                  hooks=[dict(type='TextLoggerHook'),
                         dict(type='TensorboardLoggerHook')])
log_level = 'INFO'
custom_hooks = [dict(type='CheckpointLateStageHook', start=21, priority=60)]
workflow = [('train', 1), ('val', 1)]
