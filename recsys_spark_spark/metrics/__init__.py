from .evaluation import (
    ap_coefficient,
    crossval_prediction_metrics,
    prediction_metrics,
    ranking_metrics,
    ranking_metrics_summary,
    split_ratings,
)

__all__ = [
    "ap_coefficient",
    "crossval_prediction_metrics",
    "prediction_metrics",
    "ranking_metrics",
    "ranking_metrics_summary",
    "split_ratings",
]
