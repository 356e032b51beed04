"""TPU-native geometry op library (pure functions, static shapes, custom VJPs)."""

from .pointops import (
    ball_query,
    square_distance,
    knn_point,
    knn_with_distance,
    index_points,
    gather_points,
    three_nn,
    three_interpolate,
    three_nn_interpolate,
    furthest_point_sample,
    fps,
)
from .chamfer import (
    nn_distance,
    nn_distance_eval,
    chamfer_l1,
    chamfer_l2,
    chamfer_l2_split,
    chamfer_l1_pm,
)
from .sampling import (
    jitter_points,
    random_sample,
    random_scale,
    random_dropping,
    separate_point_cloud,
    train_random_crop,
)
from .sharded import (
    make_points_mesh,
    sharded_chamfer_l1,
    sharded_chamfer_l2,
    sharded_fps,
    sharded_knn,
    sharded_nn_distance,
)
from .emd import emd_auction, emd_distance_metric
from .normals import estimate_pointcloud_normals
from .gridding import (
    cubic_feature_sampling,
    gridding,
    gridding_loss,
    gridding_reverse,
)

__all__ = [
    "square_distance",
    "knn_point",
    "knn_with_distance",
    "index_points",
    "gather_points",
    "three_nn",
    "three_interpolate",
    "three_nn_interpolate",
    "furthest_point_sample",
    "fps",
    "nn_distance",
    "nn_distance_eval",
    "chamfer_l1",
    "chamfer_l2",
    "chamfer_l2_split",
    "chamfer_l1_pm",
    "jitter_points",
    "random_sample",
    "random_scale",
    "random_dropping",
    "separate_point_cloud",
    "train_random_crop",
    "make_points_mesh",
    "sharded_nn_distance",
    "sharded_chamfer_l1",
    "sharded_chamfer_l2",
    "sharded_knn",
    "sharded_fps",
]
