# Evaluate a trained CNW checkpoint with LiDAR only
# (reference inference/unibev_val_L_full.py:16-32).
_base_ = ['../unibev_nus_LC_cnw_256_modality_dropout.py']
input_modality = dict(use_lidar=True, use_camera=False, use_radar=False,
                      use_map=False, use_external=False)
model = dict(use_lidar=True, use_camera=False)
