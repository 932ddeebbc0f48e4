"""Download NVIDIA's pretrained WaveGlow checkpoints.

Same sources as the reference (dl_pretrained.py:11-50): v2/v3/v5 from the
NGC API, v1 from Google Drive (the Drive URL needs the confirm-token dance,
so v1 falls back to a plain fetch and may require a browser for large files).
Uses urllib only — no wget/gdown dependency.
"""

from __future__ import annotations

import logging
import shutil
import urllib.request
from pathlib import Path

logger = logging.getLogger(__name__)

_NGC_URLS = {
    2: ("https://api.ngc.nvidia.com/v2/models/nvidia/waveglow_ljs_256channels"
        "/versions/2/files/waveglow_256channels_ljs_v2.pt"),
    3: ("https://api.ngc.nvidia.com/v2/models/nvidia/waveglow_ljs_256channels"
        "/versions/3/files/waveglow_256channels_ljs_v3.pt"),
    5: ("https://api.ngc.nvidia.com/v2/models/nvidia/adlr/waveglow/versions"
        "/WaveGlow-LJS_256_Channels/files"
        "/waveglow_256channels_universal_v5.pt"),
}
_GDRIVE_V1 = "https://drive.google.com/uc?id=1rpK8CzAAirq9sWZhe9nlfvxMF1dRgFbF"


def download_pretrained_model(destination: Path, version: int = 3) -> None:
  """Fetch the pretrained checkpoint (~644 MB) to ``destination``."""
  destination = Path(destination)
  destination.parent.mkdir(parents=True, exist_ok=True)
  if version in _NGC_URLS:
    url = _NGC_URLS[version]
  elif version == 1:
    url = _GDRIVE_V1
  else:
    raise ValueError(f"unsupported pretrained version {version}; "
                     f"choose from 1, 2, 3, 5")
  logger.info("Downloading pretrained waveglow model v%d from Nvidia...",
              version)
  request = urllib.request.Request(url, headers={"User-Agent": "waveglow-tpu"})
  with urllib.request.urlopen(request) as response, \
       open(destination, "wb") as out:
    shutil.copyfileobj(response, out, length=1 << 20)
  logger.info("Done: %s (%.1f MB)", destination,
              destination.stat().st_size / 1e6)
