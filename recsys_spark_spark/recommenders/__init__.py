from .neighborhood import (
    item_based_topk,
    predict_item_based,
    predict_user_based,
    user_based_topk,
)

__all__ = [
    "item_based_topk",
    "predict_item_based",
    "predict_user_based",
    "user_based_topk",
]
