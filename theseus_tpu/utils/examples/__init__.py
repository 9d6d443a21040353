from . import pose_graph
