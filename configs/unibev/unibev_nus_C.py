# Camera-only training (reference unibev_nus_C.py).  NOTE: the reference file
# names an unregistered attention type at :206
# (MSDeformableAttention3DUniQueryImg); we use the registered twin
# MSDeformableAttention3DImg, which is what actually runs.
_base_ = ['./unibev_nus_LC_cnw_256_modality_dropout.py']
input_modality = dict(use_lidar=False, use_camera=True, use_radar=False,
                      use_map=False, use_external=False)
work_dir = './outputs/train/unibev_nus_C'
model = dict(use_lidar=False, use_camera=True,
             pts_bbox_head=dict(transformer=dict(feature_norm=None)))
