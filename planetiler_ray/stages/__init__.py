"""Ray Data pipeline stages (batch transforms over Arrow).

Each module exposes vectorized ``map_batches`` callables / callable
classes.  None of them call ``ray.init``; they are pure batch → batch
functions, composable into :mod:`planetiler_ray.pipelines`.
"""
