# Evaluate a trained CNW checkpoint with camera only.
_base_ = ['../unibev_nus_LC_cnw_256_modality_dropout.py']
input_modality = dict(use_lidar=False, use_camera=True, use_radar=False,
                      use_map=False, use_external=False)
model = dict(use_lidar=False, use_camera=True)
