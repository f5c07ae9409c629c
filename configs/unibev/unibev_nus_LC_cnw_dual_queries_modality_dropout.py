# Ablation: separate BEV query embeddings per modality (reference
# unibev_nus_LC_cnw_dual_queries_modality_dropout.py:16,263).
_base_ = ['./unibev_nus_LC_cnw_256_modality_dropout.py']
dual_queries = True
work_dir = './outputs/train/unibev_cnw_dual_queries_nus_LC_full'
model = dict(pts_bbox_head=dict(dual_queries=True,
                                transformer=dict(dual_queries=True)))
