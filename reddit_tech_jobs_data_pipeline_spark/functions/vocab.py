"""Extraction vocabularies — the reference pipeline's observable behavior spec.

These constants reproduce the patterns/keyword sets of the reference
(dags/dag.py:28, 53-59, 97-112, 132-137) exactly, because they define
observable output semantics. Two reference quirks are kept deliberately
(SURVEY.md §7.4):

* the negative keyword ``'Looking for Data Engineering job'`` can never
  match a lowercased title (capital letters) — faithful dead code;
* the ``\\w+`` tokenizer can never see ``c++`` / ``c#`` — tokens lose
  punctuation, so those two tech keywords are unreachable via tokenizing.
"""

from __future__ import annotations

# dags/dag.py:28 — applied to lower(title); group 1 currency, 2 lower-k, 3 upper-k
SALARY_PATTERN = r"([A-Za-z$€£]*)\s*(\d+(?:\.\d+)?)k\s?-\s?(\d+(?:\.\d+)?)k"

# dags/dag.py:97-102 — ordered: specific roles tried before generic ones
JOB_POSITION_PATTERNS = [
    r"(Data\s*Engineer|Machine\s*Learning\s*Engineer|AI\s*Engineer|Software\s*Engineer|Backend\s*Engineer|Frontend\s*Engineer|Fullstack\s*Engineer|DevOps\s*Engineer|Cloud\s*Engineer|Data\s*Scientist|Data\s*Analyst|QA\s*Engineer|Security\s*Engineer|Research\s*Scientist)",
    r"(Engineer|Scientist|Manager|Developer|Architect|Analyst|Specialist|Director|Lead|Principal|Coordinator|Consultant|VP|Head)",
]

# dags/dag.py:104-110 — ordered: remote-type, then city, then country
LOCATION_PATTERNS = [
    r"(Remote|Telecommute|Virtual|Home\s*Office|Hybrid)",
    r"(New\s*York|San\s*Francisco|California|London|Berlin|Toronto|Austin|Boston|Seattle|Chicago|Vancouver|Los\s*Angeles|Dallas|Miami|Washington\s*DC|Montreal|Paris|Singapore|Sydney|Zurich|Gdansk)",
    r"(US|United\s*States|Canada|UK|Germany|Australia|India|Singapore|Switzerland|France|Poland)",
]

# dags/dag.py:112
FIELD_PATTERN = r"(AI|Artificial\s*Intelligence|Data\s*Science|Machine\s*Learning|Deep\s*Learning|Computer\s*Vision|NLP|Natural\s*Language\s*Processing|Data\s*Engineering|Software\s*Engineering|Cloud\s*Computing|DevOps|Cyber\s*Security|Blockchain|Robotics|Big\s*Data|Analytics)"

# dags/dag.py:132-137 — sorted here for deterministic array output
# (Python set iteration order in the reference is nondeterministic anyway).
TECH_KEYWORDS = sorted(
    {
        "python", "java", "javascript", "typescript", "c++", "c#", "ruby", "go",
        "sql", "rust", "scala", "react", "angular", "vue", "django", "flask",
        "spring", "tensorflow", "pytorch", "kubernetes", "docker", "aws", "azure",
        "gcp", "terraform", "jenkins", "redis", "mongodb", "postgresql", "mysql",
    }
)

# dags/dag.py:53-56 — substring containment against lower(title)
POSITIVE_JOB_KEYWORDS = [
    "hiring", "job", "position", "opening", "career", "recruitment",
    "employment", "vacancy", "opportunity", "role", "work",
]

# dags/dag.py:58-60 — checked before positives; last entry is faithful dead code
NEGATIVE_JOB_KEYWORDS = [
    "help", "question", "advice", "discussion", "meta", "feedback",
    "suggestion", "Looking for Data Engineering job",
]
