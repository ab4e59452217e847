"""Host-side utilities: flow visualization, image grids, profiling."""
