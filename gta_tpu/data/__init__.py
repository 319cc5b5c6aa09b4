from gta_tpu.data.synthetic import SyntheticScenes
from gta_tpu.data.registry import get_dataset
