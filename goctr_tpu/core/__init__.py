from goctr_tpu.core.dtypes import DTypePolicy, default_policy
from goctr_tpu.core.meshes import MeshSpec, make_mesh, data_axis, model_axis
from goctr_tpu.core.prng import PRNGPool
