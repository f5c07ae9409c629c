# Evaluate a trained CNW checkpoint with BOTH sensors.  (The reference twin
# has a known `_base_` typo '.pyy' at :5 that makes it unusable; fixed here.)
_base_ = ['../unibev_nus_LC_cnw_256_modality_dropout.py']
input_modality = dict(use_lidar=True, use_camera=True, use_radar=False,
                      use_map=False, use_external=False)
