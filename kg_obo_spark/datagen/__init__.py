from kg_obo_spark.datagen.ontology import build_ontology, Ontology
from kg_obo_spark.datagen.transcripts import generate_transcripts

__all__ = ["build_ontology", "Ontology", "generate_transcripts"]
