"""Ontology import: OWL/RDFS triples -> hierarchy tables (SURVEY.md
§2.1 S10, §2.10 R5).

Reference: ``semantics/LiteOntologyImporter.java`` — extracts classes
(:154-183), class hierarchy SCO (:185-195), datatype/object property
hierarchies SPO/SRO (:70-97, 136-147), and DOMAIN/RANGE (:111-134)
from an ontology document, storing them as ontology nodes + edges.
Here each becomes a small DataFrame (FIXTURES.md §F4/F5 shapes) that
``pidb_rdf_spark.inference`` closes over; they are vocabulary-sized
and broadcast into data-scale joins.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"

SCO = "SCO"
SPO = "SPO"
SRO = "SRO"


@dataclass
class Ontology:
    classes: DataFrame        # name, label(optional comment)
    hierarchy: DataFrame      # child, parent, kind in {SCO, SPO, SRO}
    domains: DataFrame        # prop, clazz
    ranges: DataFrame         # prop, clazz


def _objects_of(triples: DataFrame, pred: str) -> DataFrame:
    return triples.filter(
        (F.col("predicate") == pred) & ~F.col("is_literal")
    )


def lite_onto_import(triples: DataFrame) -> Ontology:
    """Triples of an ontology document -> Ontology tables.

    Mirrors the reference's extraction queries: classes are
    ``?c rdf:type owl:Class|rdfs:Class``; SCO edges from
    ``rdfs:subClassOf``; property hierarchies from
    ``rdfs:subPropertyOf`` split by the property's declared kind
    (owl:DatatypeProperty -> SPO, owl:ObjectProperty -> SRO);
    domain/range from ``rdfs:domain`` / ``rdfs:range``."""
    typed = _objects_of(triples, RDF + "type")
    classes = typed.filter(
        F.col("object").isin(OWL + "Class", RDFS + "Class")
    ).select(F.col("subject").alias("name")).distinct()

    dt_props = typed.filter(F.col("object") == OWL + "DatatypeProperty").select(
        F.col("subject").alias("p")
    )
    obj_props = typed.filter(F.col("object") == OWL + "ObjectProperty").select(
        F.col("subject").alias("p")
    )

    sco = _objects_of(triples, RDFS + "subClassOf").select(
        F.col("subject").alias("child"),
        F.col("object").alias("parent"),
        F.lit(SCO).alias("kind"),
    )
    subprop = _objects_of(triples, RDFS + "subPropertyOf")
    spo = subprop.join(
        dt_props.withColumnRenamed("p", "subject"), on="subject", how="leftsemi"
    ).select(
        F.col("subject").alias("child"),
        F.col("object").alias("parent"),
        F.lit(SPO).alias("kind"),
    )
    sro = subprop.join(
        obj_props.withColumnRenamed("p", "subject"), on="subject", how="leftsemi"
    ).select(
        F.col("subject").alias("child"),
        F.col("object").alias("parent"),
        F.lit(SRO).alias("kind"),
    )
    hierarchy = sco.unionAll(spo).unionAll(sro)

    domains = _objects_of(triples, RDFS + "domain").select(
        F.col("subject").alias("prop"), F.col("object").alias("clazz")
    )
    ranges = _objects_of(triples, RDFS + "range").select(
        F.col("subject").alias("prop"), F.col("object").alias("clazz")
    )
    return Ontology(classes=classes, hierarchy=hierarchy, domains=domains, ranges=ranges)
