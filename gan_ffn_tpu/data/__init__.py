from .datasets import (
    AVECDataset,
    DailyDialogueDataset,
    IEMOCAPDataset,
    MELDDataset,
)
from .loaders import (
    Batch,
    BucketedLoader,
    TokenBucketedLoader,
    collate_token_dialogues,
    get_avec_loaders,
    get_dailydialogue_loaders,
    get_iemocap_loaders,
    get_meld_loaders,
    head_tail_split,
)
from .synthetic import (
    IEMOCAP_DIMS,
    MELD_DIMS,
    write_synthetic_avec,
    write_synthetic_dailydialogue,
    write_synthetic_iemocap,
    write_synthetic_meld,
)

__all__ = [
    "AVECDataset",
    "Batch",
    "BucketedLoader",
    "DailyDialogueDataset",
    "IEMOCAPDataset",
    "IEMOCAP_DIMS",
    "MELDDataset",
    "MELD_DIMS",
    "TokenBucketedLoader",
    "collate_token_dialogues",
    "get_avec_loaders",
    "get_dailydialogue_loaders",
    "get_iemocap_loaders",
    "get_meld_loaders",
    "head_tail_split",
    "write_synthetic_avec",
    "write_synthetic_dailydialogue",
    "write_synthetic_iemocap",
    "write_synthetic_meld",
]
