"""Training-data-pipeline operators over the documents/embeddings tables."""
