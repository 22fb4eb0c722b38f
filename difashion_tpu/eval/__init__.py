from difashion_tpu.eval.metrics import (
    activation_statistics,
    clip_image_score,
    clip_score,
    fid_from_features,
    frechet_distance,
    inception_metrics,
    personalization_sim,
    retrieval_accuracy,
    topn_recall,
)

__all__ = [
    "activation_statistics",
    "clip_image_score",
    "clip_score",
    "fid_from_features",
    "frechet_distance",
    "inception_metrics",
    "personalization_sim",
    "retrieval_accuracy",
    "topn_recall",
]
