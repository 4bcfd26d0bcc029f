"""Data pipeline: TP-Dataset loader, paired transforms, synthetic data."""

from egm_unet_tpu.data.dataset import DriveDataset, collate_pad  # noqa: F401
from egm_unet_tpu.data.fewshot import FewShotSegDataset  # noqa: F401
from egm_unet_tpu.data.synthetic import synthetic_tp_batch, SyntheticTPDataset  # noqa: F401
from egm_unet_tpu.data import transforms  # noqa: F401
