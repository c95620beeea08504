"""Lightweight logging (the reference's LOG_STRING -> OutputDebugString,
Source/Logging.cpp:4-20, and its scene-load stats, Scene.cpp:170-293).

Standard `logging` under the "dcrt" namespace; enable with
DCRT_LOG=1 (info) or DCRT_LOG=debug.
"""

import logging
import os

logger = logging.getLogger("dcrt")

_level = os.environ.get("DCRT_LOG")
if _level:
    logging.basicConfig()
    logger.setLevel(logging.DEBUG if _level.lower() == "debug"
                    else logging.INFO)
