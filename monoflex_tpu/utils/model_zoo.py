"""Remote weight resolution with a local cache
(reference: utils/model_zoo.py, utils/check_point.py:122-134)."""

from __future__ import annotations

import os
import urllib.request

DEFAULT_CACHE = os.path.expanduser(os.environ.get(
    "MONOFLEX_CACHE_DIR", "~/.cache/monoflex_tpu"))

DLA34_IMAGENET_URL = "http://dl.yf.io/dla/models/imagenet/dla34-ba72cf86.pth"


def cache_url(url: str, cache_dir: str | None = None) -> str:
    """Download (once) and return the local path for a weight URL."""
    cache_dir = cache_dir or DEFAULT_CACHE
    os.makedirs(cache_dir, exist_ok=True)
    filename = os.path.basename(url.split("?")[0])
    path = os.path.join(cache_dir, filename)
    if not os.path.exists(path):
        tmp = path + ".part"
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, path)
    return path
