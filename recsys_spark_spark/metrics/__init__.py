from .evaluation import (
    ap_coefficient,
    prediction_metrics,
    ranking_metrics,
    ranking_metrics_summary,
    split_ratings,
)

__all__ = [
    "ap_coefficient",
    "prediction_metrics",
    "ranking_metrics",
    "ranking_metrics_summary",
    "split_ratings",
]
