# Modality-dropout ablation: p_md=0.0, p_L=0.5
# (reference ablation_md grid, e.g. ..._m50s50l25c75.py:15-18).
_base_ = ['../unibev_nus_LC_cnw_256_modality_dropout.py']
modality_dropout_prob = dict(dropout_prob=0.0, lidar_prob=0.5)
work_dir = './outputs/train/unibev_cnw_ablation_md0_l50'
model = dict(pts_bbox_head=dict(transformer=dict(
    drop_modality=dict(dropout_prob=0.0, lidar_prob=0.5))))
