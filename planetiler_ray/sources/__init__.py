"""Input sources: image tables (parquet/Lance-shaped) and derived inputs."""

from .images import images_from_documents, sample_image_ids
