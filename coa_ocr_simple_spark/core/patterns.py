"""Pattern banks — the frozen regex vocabulary of the extraction engine.

These banks reproduce, as *data*, the regexes the reference applies; the
surrounding engine is a from-scratch Spark-first design.  Parity citations
(file:line in /root/reference/):

- classification banks .............. ai_document_processor.py:238-250
- common auto-discovery fields ...... ai_document_processor.py:52-87
- product-name patterns ............. ai_document_processor.py:560-566
- COA field banks ................... ai_document_processor.py:443-508
- SDS field patterns ................ ai_document_processor.py:401-416
- TDS field patterns ................ ai_document_processor.py:422-435
- table header / end markers ........ ai_document_processor.py:582-605
- key-value discovery patterns ...... ai_document_processor.py:722-725
- discovery stopwords ............... ai_document_processor.py:740

All patterns are Python ``re`` syntax and MUST be evaluated with Python
``re`` (not Java/RE2 regexp_* builtins) on the parity path — see
SURVEY.md §4.3.3.
"""

from __future__ import annotations

# --- classification (applied to text.lower(); ai:238-250) -------------------

SDS_CLASS_PATTERNS = [
    r"safety\s+data\s+sheet",
    r"material\s+safety\s+data\s+sheet",
    r"msds",
    r"sds\s+number",
    r"section\s+[1-9][0-6]?[\s:]+\w+",
    r"hazard(s)?\s+identification",
]

TDS_CLASS_PATTERNS = [
    r"technical\s+data\s+sheet",
    r"product\s+specification",
    r"technical\s+specification",
    r"physical\s+properties",
    r"application\s+guide",
    r"technical\s+bulletin",
]

COA_CLASS_PATTERNS = [
    r"certificate\s+of\s+analysis",
    r"c\.?o\.?a\.?",
    r"analytical\s+result",
    r"test\s+result",
    r"batch\s+analysis",
    r"quality\s+release",
    r"purity\s+analysis",
    r"lot\s+number",
    r"batch\s+number",
    r"certified\s+purity",
]

# --- product name (ai:560-566); ordered, first match wins -------------------

PRODUCT_NAME_PATTERNS = [
    r"(?i)Product\s+Name\s*[:.]\s*([^\n]+)",
    r"(?i)Product\s+identifier\s*[:.]\s*([^\n]+)",
    r"(?i)Trade\s+name\s*[:.]\s*([^\n]+)",
    r"(?i)Material\s+name\s*[:.]\s*([^\n]+)",
    r"(?i)Product:\s*([^\n]+)",
]

# --- COA field banks (ai:443-508); ordered, first match wins ----------------

COA_BATCH_PATTERNS = [
    r"(?i)(?:Batch|Lot)\s+(?:Number|No|#)\s*[:.]\s*([A-Za-z0-9\-]+)",
    r"(?i)(?:Batch|Lot)[:.]\s*([A-Za-z0-9\-]+)",
    r"(?i)(?:Batch|Lot)\s*(?:Number|No|#)?\s*[:.]\s*([A-Za-z0-9\-]+)",
]

COA_CAS_PATTERNS = [
    r"(?i)CAS\s+(?:Number|No|#)\s*[:.]\s*([0-9\-]+)",
    r"(?i)CAS[:.]\s*([0-9\-]+)",
    r"\b(\d{2,7}-\d{2}-\d)\b",
]

COA_APPEARANCE_PATTERNS = [
    r"(?i)Appearance\s+Visual\s+[-–]\s+([^\n]+)",
    r"(?i)Appearance[:.]\s*([^\n]+)",
]

COA_DENSITY_PATTERNS = [
    # captures the *result* column (second number) of the ASTM table row
    r"(?i)Density\s+@\s+20[^\s]*\s+ASTM\s+D\s+1298\s+g/ml\s+\d+\.\d+\s+(\d+\.\d+)",
    r"(?i)Density[:.]\s*(\d+\.\d+)",
]

COA_PURITY_PATTERNS = [
    r"(?i)Purity\s+ASTM\s+D\s+3545\s+%\s+wt\s+\d+(?:[^%]+)(\d+\.\d+AC)",
    r"(?i)(?:Purity|Assay)\s*[:.]\s*([\d.]+\s*%)",
    r"(?i)(?:Purity|Assay)(?:\s+Result)?\s*[:.]\s*([\d.]+)",
]

# --- SDS field patterns (ai:401-416) -----------------------------------------

SDS_HAZARD_CODES = r"\b(H\d{3}[A-Za-z]?)\b"
SDS_EMERGENCY = (
    r"(?i)Emergency\s+(?:telephone|phone|contact)(?:\s+number)?\s*[.:]?\s*"
    r"([0-9()\s\-+]{7,20})"
)
SDS_MANUFACTURER = r"(?i)(?:Manufacturer|Supplier|Company)(?:\s+name)?\s*[.:]?\s*([^\n]+)"
CAS_GENERAL = r"\b(\d{2,7}-\d{2}-\d)\b"

# --- TDS field patterns (ai:422-435) -----------------------------------------

TDS_DENSITY = r"(?i)(?:Density|Specific\s+Gravity)\s*[:.]\s*([\d.,]+\s*(?:g/cm3|kg/m3|g/mL))"
TDS_VISCOSITY = r"(?i)Viscosity\s*[:.]\s*([\d.,]+\s*(?:mPas|cP|Pa\.s))"
TDS_FLASH_POINT = r"(?i)Flash\s+Point\s*[:.]\s*([\d.,]+\s*(?:°C|°F))"
TDS_STORAGE = r"(?i)Storage(?:\s+conditions?)?\s*[:.]\s*([^\n]+)"

# --- sectionization (ai:278, 307-317, 328-373) --------------------------------

SDS_SECTION_HEADING = r"(?i)(?:SECTION|)\s*(\d{1,2})[.:)\s]+\s*([^0-9\n]{2,50})"

TDS_PROPERTIES_SECTION = (
    r"(?i)(Technical\s+(?:Data|Properties|Information)[\s\S]*?)"
    r"(?:Application|Storage|Notes|Disclaimer|$)"
)
TDS_APPLICATIONS_SECTION = (
    r"(?i)(Applications?|Uses?|Recommended\s+for)[\s\S]*?"
    r"(?:Storage|Handling|Notes|Disclaimer|$)"
)

COA_RESULTS_SECTION_PATTERNS = [
    r"(?i)((?:Test|Analytical)\s+(?:Results|Data)[\s\S]*?)"
    r"(?:Conclusion|Release|Approval|Authorized|$)",
    r"(?i)(TEST\s+RESULTS[\s\S]*?)" r"(?:This lot|Analysis|Conclusion|$)",
    r"(?i)((?:Parameter|Test|Property)[\s\n]+(?:Specification|Spec|Limit)[\s\n]+"
    r"(?:Result|Value)[\s\S]*?)"
    r"(?:This lot|Analysis|Conclusion|$)",
]

COA_SPECS_SECTION_PATTERNS = [
    r"(?i)((?:Specifications?|Requirements|Limits)[\s\S]*?)"
    r"(?:Test|Analytical|Conclusion|$)",
    r"(?i)((?:Specifications?[\s\n]+)(?:[\s\S]*?))" r"(?:Test|Analytical|Conclusion|$)",
]

COA_PRODUCT_INFO_SECTION_PATTERNS = [
    r"(?i)(Product(?:\s+Name|:)[\s\S]*?)" r"(?:TEST|Analytical|Specifications|$)",
    r"(?:^|[\n\r]+)((?:Product|Catalog|Lot|Batch|CAS)[\s\S]*?)"
    r"(?:TEST|Analytical|Specifications|$)",
]

# --- test-result table parse (ai:582-605, 645) --------------------------------

TABLE_HEADER = (
    r"(?i)(?:Parameter|Test|Property|Description)\s+(?:Specification|Spec|Limit)\s+"
    r"(?:Result|Value|Reading)"
)

TABLE_END_MARKERS = [
    r"\n\s*\n",
    r"(?:This lot|Analysis|Conclusion)",
    r"(?:for laboratory use|store at)",
]

ROW_SPLIT = r"\s{2,}|\t"

KEY_VALUE_TEST_PATTERN = (
    r"(?i)([A-Za-z0-9\s\-]+):\s*"
    r"((?:[\d\.<>]+\s*(?:ppm|%|mg|g)){0,1}(?:[A-Za-z]+\s*)?(?:-\s*)?)"
    r"((?:[\d\.<>]+\s*(?:ppm|%|mg|g))(?:\s*[A-Za-z]+)?|PASS|FAIL|Conforms)"
)

# --- auto-discovery (ai:52-87, 722-740, 771-774) -------------------------------

COMMON_FIELDS = {
    "product_name": [
        r"(?i)Product\s+Name\s*[:.]\s*([^\n]+)",
        r"(?i)Product\s+identifier\s*[:.]\s*([^\n]+)",
        r"(?i)Trade\s+name\s*[:.]\s*([^\n]+)",
    ],
    "cas_number": [
        r"(?i)CAS\s+(?:Number|No|#)\s*[:.]\s*([0-9\-]+)",
        r"(?i)CAS[:.]\s*([0-9\-]+)",
        r"\b(\d{2,7}-\d{2}-\d)\b",
    ],
    "batch_number": [
        r"(?i)(?:Batch|Lot)\s+(?:Number|No|#)\s*[:.]\s*([A-Za-z0-9\-]+)",
        r"(?i)(?:Batch|Lot)[:.]\s*([A-Za-z0-9\-]+)",
    ],
    "appearance": [
        r"(?i)Appearance\s+Visual\s+[-–]\s+([^\n]+)",
        r"(?i)Appearance[:.]\s*([^\n]+)",
    ],
    "density": [
        r"(?i)Density\s+@\s+20[^\s]*\s+ASTM\s+D\s+1298\s+g/ml\s+(\d+\.\d+)",
        r"(?i)Density[:.]\s*(\d+\.\d+\s*(?:g/cm3|kg/m3|g/mL)?)",
    ],
    "purity": [
        r"(?i)Purity\s+ASTM\s+D\s+3545\s+%\s+wt\s+\d+(?:[^%]+)(\d+\.\d+AC)",
        r"(?i)(?:Purity|Assay)\s*[:.]\s*([\d.]+\s*%)",
        r"(?i)(?:Purity|Assay)(?:\s+Result)?\s*[:.]\s*([\d.]+)",
    ],
    "manufacturer": [
        r"(?i)(?:Manufacturer|Supplier|Company)(?:\s+name)?\s*[.:]?\s*([^\n]+)"
    ],
    "date": [
        r"(?i)(?:Date\s+of\s+(?:Analysis|Test|Manufacture)|Release\s+Date|Analysis\s+Date)"
        r"\s*[:.]\s*(\d{1,2}[-/.]\d{1,2}[-/.]\d{2,4})",
        r"(?i)(?:Date\s+of\s+(?:Analysis|Test|Manufacture)|Release\s+Date|Analysis\s+Date)"
        r"\s*[:.]\s*(\w+\s+\d{1,2},?\s+\d{4})",
    ],
}

KEY_VALUE_DISCOVERY_PATTERNS = [
    r"(?im)^([A-Z][A-Za-z0-9\s\-]{2,30})\s*[:.]\s*([^\n]+)$",
    r"(?i)([A-Za-z][A-Za-z0-9\s\-]{2,30})\s*[:.]\s+([^\n\r]{1,100}(?:\n|\r|$))",
]

DISCOVERY_STOPWORDS = frozenset({"the", "and", "for", "this", "with", "from"})

DISCOVERY_TABLE_HEADERS = [
    r"(?i)(?:Test|Parameter|Property)\s+(?:Specification|Spec|Limit)\s+"
    r"(?:Result|Value|Reading)",
    r"(?i)(?:Attribute|Characteristic)\s+(?:Specification|Requirement)\s+"
    r"(?:Result|Observation)",
    r"(?i)(?:Parameter|Test)\s+(?:Method|Standard)\s+(?:Unit)\s+(?:Specification)\s+"
    r"(?:Result)",
]
