from ndt_feature_graph_tpu.core import se2
from ndt_feature_graph_tpu.core import motion_model
