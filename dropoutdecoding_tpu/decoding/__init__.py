from .masks import build_member_drop_mask, epis_mask_probs, overlap_keep_mask
from .aggregate import select_by_vote, select_by_average
