"""Dataset name -> on-disk location catalog (reference: config/paths_catalog.py:3-27)."""

import os


class DatasetCatalog:
    DATA_DIR = os.environ.get("MONOFLEX_DATA_DIR", "./datasets")
    DATASETS = {
        "kitti_train": {"root": "kitti/training"},
        "kitti_test": {"root": "kitti/testing"},
        "kitti_demo": {"root": "kitti_demo"},
    }

    @staticmethod
    def get(name: str):
        if name not in DatasetCatalog.DATASETS:
            raise RuntimeError(f"Dataset not available: {name}")
        root = os.path.join(DatasetCatalog.DATA_DIR, DatasetCatalog.DATASETS[name]["root"])
        return dict(factory="KITTIDataset", args=dict(root=root))


class ModelCatalog:
    """catalog:// weight indirection (reference: config/paths_catalog.py:30-44)."""

    URL_PREFIX = "http://dl.yf.io/dla/models"
    MODELS = {
        "DLA/dla34": "imagenet/dla34-ba72cf86.pth",
    }

    @staticmethod
    def get(name: str) -> str:
        if name.startswith("catalog://"):
            name = name[len("catalog://"):]
        if name not in ModelCatalog.MODELS:
            raise RuntimeError(f"Model not present in catalog: {name}")
        return f"{ModelCatalog.URL_PREFIX}/{ModelCatalog.MODELS[name]}"


def resolve_weight_path(spec: str, cache_dir: str | None = None) -> str:
    """catalog:// or http(s):// or local path -> local file path."""
    from ..utils.model_zoo import cache_url

    if spec.startswith("catalog://"):
        spec = ModelCatalog.get(spec)
    if spec.startswith(("http://", "https://")):
        return cache_url(spec, cache_dir)
    return spec
