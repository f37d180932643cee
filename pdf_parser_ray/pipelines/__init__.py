"""End-to-end pipeline compositions over ray.data.Dataset."""
