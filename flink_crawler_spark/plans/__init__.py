"""Plans: end-to-end crawl dataflows assembled from operators."""
