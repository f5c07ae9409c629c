# UniBEV_avg: channel-averaging fusion (reference diff at :12-13 —
# fusion_method 'avg', no feature norm).
_base_ = ['./unibev_nus_LC_cnw_256_modality_dropout.py']
fusion_method = 'avg'
feature_norm = None
work_dir = './outputs/train/unibev_avg_dim_256_nus_LC_full'
model = dict(pts_bbox_head=dict(transformer=dict(
    fusion_method='avg', feature_norm=None)))
