"""Ray Data stages: batch transforms, actor pools, and grouped shuffles.

Each module exposes functions taking/returning ``ray.data.Dataset`` so
pipelines compose by chaining. Nothing here calls ``ray.init()``.
"""
