"""Task registry / factory (reference
src/chug/task_pipeline/pipeline_factory.py:9-19: cfg-class → builder dispatch).
"""

from __future__ import annotations

from .docvqa import build_vqa
from .gtparse import build_gtparse
from .imagetext import build_image_text
from .manual import build_manual

TASK_BUILDERS = {
    "doc_read": "chug_spark.extract.extract_docread",  # flagship, own signature
    "doc_vqa": build_vqa,
    "image_text": build_image_text,
    "gtparse": build_gtparse,
    "manual": build_manual,
}


def get_task_builder(name: str):
    try:
        return TASK_BUILDERS[name]
    except KeyError:
        raise ValueError(f"unknown task {name!r}; known: {sorted(TASK_BUILDERS)}")
