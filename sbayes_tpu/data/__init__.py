from sbayes_tpu.data.loader import Confounder, Data, Features, Objects, read_features_from_csv  # noqa: F401
from sbayes_tpu.data.geo import ComputeNetwork, read_geo_cost_matrix  # noqa: F401
