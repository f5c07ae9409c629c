# LiDAR-only training (reference unibev_nus_L.py, model at :170-259).
_base_ = ['./unibev_nus_LC_cnw_256_modality_dropout.py']
input_modality = dict(use_lidar=True, use_camera=False, use_radar=False,
                      use_map=False, use_external=False)
work_dir = './outputs/train/unibev_nus_L'
model = dict(use_lidar=True, use_camera=False,
             pts_bbox_head=dict(transformer=dict(feature_norm=None)))
