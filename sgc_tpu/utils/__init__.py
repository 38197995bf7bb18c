from sgc_tpu.utils.paths import data_dir
from sgc_tpu.utils.seeding import set_seed

__all__ = ["data_dir", "set_seed"]
