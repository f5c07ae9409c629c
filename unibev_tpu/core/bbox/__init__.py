from unibev_tpu.core.bbox import assigners, coders, match_costs  # noqa: F401 (registration)
from unibev_tpu.core.bbox.util import normalize_bbox, denormalize_bbox  # noqa: F401
from unibev_tpu.core.bbox.lsa import linear_sum_assignment  # noqa: F401
