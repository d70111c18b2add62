"""EN + ES stopword lists for the tokenize→stem→stopword text kernel.

Verbatim ports of the reference's vendored stopword data (module/
instagram/lda/stopwords_en.js:1-662 → 660 entries; stopwords_es.js:3-714
→ 767 own entries, which the reference unions with the EN list via the
spread at stopwords_es.js:716). Lists are *data*, not behavior —
reference parity requires the exact inventories, because every word
present/absent changes which tokens survive ``drop_stop_tokens`` and
therefore which topics ``attach_topics`` emits (lda/index.js:25-28, 40).
Order is irrelevant (membership sets); entries are kept in reference
order for auditability. A few entries ("co.", "no-one", "por que") can
never match a post-normalization token — the reference carries the same
dead entries; we keep them verbatim rather than "fix" the data.

Exposed as plain frozensets so they can be used three ways without
serialization cost:

- as a literal in ``F.array_except`` / ``Column.isin`` expressions
  (JVM-side, codegen'd — the hot path),
- as ``pyspark.ml.feature.StopWordsRemover(stopWords=...)`` input,
- inside pandas UDFs (the stemmer pipeline).
"""

from __future__ import annotations

# stopwords_en.js:1-662 — 660 entries, verbatim
EN: frozenset[str] = frozenset((
    "a", "able", "about", "above", "abroad", "according", "accordingly", "across",
    "actually", "adj", "after", "afterwards", "again", "against", "ago", "ahead",
    "aint", "all", "allow", "allows", "almost", "alone", "along", "alongside",
    "already", "also", "although", "always", "am", "amid", "amidst", "among",
    "amongst", "an", "and", "another", "any", "anybody", "anyhow", "anyone",
    "anything", "anyway", "anyways", "anywhere", "apart", "appear", "appreciate", "appropriate",
    "are", "arent", "around", "as", "as", "aside", "ask", "asking",
    "associated", "at", "available", "away", "awfully", "b", "back", "backward",
    "backwards", "be", "became", "because", "become", "becomes", "becoming", "been",
    "before", "beforehand", "begin", "behind", "being", "believe", "below", "beside",
    "besides", "best", "better", "between", "beyond", "both", "brief", "but",
    "by", "c", "came", "can", "cannot", "cant", "cant", "caption",
    "cause", "causes", "certain", "certainly", "changes", "clearly", "cmon", "co",
    "co.", "com", "come", "comes", "concerning", "consequently", "consider", "considering",
    "constructor", "contain", "containing", "contains", "corresponding", "could", "couldnt", "course",
    "cs", "currently", "d", "dare", "darent", "definitely", "described", "despite",
    "did", "didnt", "different", "directly", "do", "does", "doesnt", "doing",
    "done", "dont", "down", "downwards", "during", "e", "each", "edu",
    "eg", "eight", "eighty", "either", "else", "elsewhere", "end", "ending",
    "enough", "entirely", "especially", "et", "etc", "even", "ever", "evermore",
    "every", "everybody", "everyone", "everything", "everywhere", "ex", "exactly", "example",
    "except", "f", "fairly", "far", "farther", "few", "fewer", "fifth",
    "first", "five", "followed", "following", "follows", "for", "forever", "former",
    "formerly", "forth", "forward", "found", "four", "from", "further", "furthermore",
    "g", "get", "gets", "getting", "given", "gives", "go", "goes",
    "going", "gone", "got", "gotten", "greetings", "h", "had", "hadnt",
    "half", "happens", "hardly", "has", "hasnt", "have", "havent", "having",
    "he", "hed", "hell", "hello", "help", "hence", "her", "here",
    "hereafter", "hereby", "herein", "heres", "hereupon", "hers", "herself", "hes",
    "hi", "him", "himself", "his", "hither", "hopefully", "how", "howbeit",
    "however", "hundred", "i", "id", "ie", "if", "ignored", "ill",
    "im", "immediate", "in", "inasmuch", "inc", "inc.", "indeed", "indicate",
    "indicated", "indicates", "inner", "inside", "insofar", "instead", "into", "inward",
    "is", "isnt", "it", "itd", "itll", "its", "its", "itself",
    "ive", "j", "just", "k", "keep", "keeps", "kept", "know",
    "known", "knows", "l", "last", "lately", "later", "latter", "latterly",
    "least", "less", "lest", "let", "lets", "like", "liked", "likely",
    "likewise", "little", "look", "looking", "looks", "low", "lower", "ltd",
    "m", "made", "mainly", "make", "makes", "many", "may", "maybe",
    "maynt", "me", "mean", "meantime", "meanwhile", "merely", "might", "mightnt",
    "mine", "minus", "miss", "more", "moreover", "most", "mostly", "mr",
    "mrs", "much", "must", "mustnt", "my", "myself", "n", "name",
    "namely", "nd", "near", "nearly", "necessary", "need", "neednt", "needs",
    "neither", "never", "neverf", "neverless", "nevertheless", "new", "next", "nine",
    "ninety", "no", "nobody", "non", "none", "nonetheless", "noone", "no-one",
    "nor", "normally", "not", "nothing", "notwithstanding", "novel", "now", "nowhere",
    "o", "obviously", "of", "off", "often", "oh", "ok", "okay",
    "old", "on", "once", "one", "ones", "ones", "only", "onto",
    "opposite", "or", "other", "others", "otherwise", "ought", "oughtnt", "our",
    "ours", "ourselves", "out", "outside", "over", "overall", "own", "p",
    "particular", "particularly", "past", "per", "perhaps", "placed", "please", "plus",
    "possible", "presumably", "probably", "provided", "provides", "q", "que", "quite",
    "qv", "r", "rather", "rd", "re", "really", "reasonably", "recent",
    "recently", "regarding", "regardless", "regards", "relatively", "respectively", "right", "round",
    "s", "said", "same", "saw", "say", "saying", "says", "second",
    "secondly", "see", "seeing", "seem", "seemed", "seeming", "seems", "seen",
    "self", "selves", "sensible", "sent", "serious", "seriously", "seven", "several",
    "shall", "shant", "she", "shed", "shell", "shes", "should", "shouldnt",
    "since", "six", "so", "some", "somebody", "someday", "somehow", "someone",
    "something", "sometime", "sometimes", "somewhat", "somewhere", "soon", "sorry", "specified",
    "specify", "specifying", "still", "sub", "such", "sup", "sure", "t",
    "take", "taken", "taking", "tell", "tends", "th", "than", "thank",
    "thanks", "thanx", "that", "thatll", "thats", "thats", "thatve", "the",
    "their", "theirs", "them", "themselves", "then", "thence", "there", "thereafter",
    "thereby", "thered", "therefore", "therein", "therell", "therere", "theres", "theres",
    "thereupon", "thereve", "these", "they", "theyd", "theyll", "theyre", "theyve",
    "thing", "things", "think", "third", "thirty", "this", "thorough", "thoroughly",
    "those", "though", "three", "through", "throughout", "thru", "thus", "till",
    "to", "together", "too", "took", "toward", "towards", "tried", "tries",
    "truly", "try", "trying", "ts", "twice", "two", "u", "un",
    "under", "underneath", "undoing", "unfortunately", "unless", "unlike", "unlikely", "until",
    "unto", "up", "upon", "upwards", "us", "use", "used", "useful",
    "uses", "using", "usually", "v", "value", "various", "versus", "very",
    "via", "viz", "vs", "w", "want", "wants", "was", "wasnt",
    "way", "we", "wed", "welcome", "well", "well", "went", "were",
    "were", "werent", "weve", "what", "whatever", "whatll", "whats", "whatve",
    "when", "whence", "whenever", "where", "whereafter", "whereas", "whereby", "wherein",
    "wheres", "whereupon", "wherever", "whether", "which", "whichever", "while", "whilst",
    "whither", "who", "whod", "whoever", "whole", "wholl", "whom", "whomever",
    "whos", "whose", "why", "will", "willing", "wish", "with", "within",
    "without", "wonder", "wont", "would", "wouldnt", "x", "y", "yes",
    "yet", "you", "youd", "youll", "your", "youre", "yours", "yourself",
    "yourselves", "youve", "z", "zero",))

# stopwords_es.js:3-714 — the ES file's own 767 entries, verbatim
# (the trailing ``...en_stop_words`` spread at stopwords_es.js:716 is
# applied in ``combined()``, mirroring the file's export exactly)
ES_OWN: frozenset[str] = frozenset((
    "0", "1", "2", "3", "4", "5", "6", "7",
    "8", "9", "a", "aca", "actualmente", "acuerdo", "adelante", "ademas",
    "adrede", "afirmo", "agrego", "ahi", "ahora", "ajena", "ajenas", "ajeno",
    "ajenos", "al", "algo", "algun", "alguna", "algunas", "alguno", "algunos",
    "alla", "alli", "alrededor", "ambos", "ampleamos", "anadio", "antano", "ante",
    "anterior", "antes", "apenas", "aproximadamente", "aquel", "aquella", "aquellas", "aquello",
    "aquellos", "aqui", "arriba", "arribaabajo", "aseguro", "asi", "atras", "aun",
    "aunque", "ayer", "b", "bajo", "bastante", "bien", "breve", "buen",
    "buena", "buenas", "bueno", "buenos", "c", "cabe", "cada", "casi",
    "cerca", "cierta", "ciertas", "cierto", "ciertos", "cinco", "claro", "comento",
    "como", "con", "conmigo", "conocer", "conseguimos", "conseguir", "considera", "considero",
    "consigo", "consigue", "consiguen", "consigues", "contigo", "contra", "cosas", "creo",
    "cual", "cuales", "cualquier", "cualquiera", "cualquieras", "cuan", "cuando", "cuanta",
    "cuantas", "cuanto", "cuantos", "cuatro", "cuenta", "d", "da", "dado",
    "dan", "dar", "de", "debajo", "debe", "deben", "debido", "decir",
    "dejar", "dejo", "del", "delante", "demas", "demasiada", "demasiadas", "demasiado",
    "demasiados", "dentro", "deprisa", "desde", "despacio", "despues", "detras", "dia",
    "dias", "dice", "dicen", "dicho", "dieron", "diferente", "diferentes", "dijeron",
    "dijo", "dio", "disponer", "disponga", "dispongais", "dispongamos", "dispongas", "dispongo",
    "donde", "dos", "durante", "e", "ejemplo", "el", "ella", "ellas",
    "ello", "ellos", "embargo", "empleais", "emplean", "emplear", "empleas", "empleo",
    "en", "encima", "encuentra", "enfrente", "enseguida", "entonces", "entre", "era",
    "erais", "eramos", "eran", "eras", "eres", "es", "esa", "esas",
    "ese", "eses", "eso", "esos", "esta", "estaba", "estabais", "estabamos",
    "estaban", "estabas", "estad", "estada", "estadas", "estado", "estados", "estais",
    "estamos", "estan", "estando", "estar", "estara", "estaran", "estaras", "estare",
    "estareis", "estaremos", "estaria", "estariais", "estariamos", "estarian", "estarias", "estas",
    "este", "esteis", "estemos", "esten", "estes", "esto", "estos", "estoy",
    "estuve", "estuviera", "estuvierais", "estuvieramos", "estuvieran", "estuvieras", "estuvieron", "estuviese",
    "estuvieseis", "estuviesemos", "estuviesen", "estuvieses", "estuvimos", "estuviste", "estuvisteis", "estuvo",
    "etc", "ex", "excepto", "existe", "existen", "explico", "expreso", "f",
    "fin", "final", "fue", "fuera", "fuerais", "fueramos", "fueran", "fueras",
    "fueron", "fuese", "fueseis", "fuesemos", "fuesen", "fueses", "fui", "fuimos",
    "fuiste", "fuisteis", "g", "general", "gran", "grandes", "gueno", "h",
    "ha", "habeis", "haber", "habia", "habiais", "habiamos", "habian", "habias",
    "habida", "habidas", "habido", "habidos", "habiendo", "habla", "hablan", "habra",
    "habran", "habras", "habre", "habreis", "habremos", "habria", "habriais", "habriamos",
    "habrian", "habrias", "hace", "haceis", "hacemos", "hacen", "hacer", "hacerlo",
    "haces", "hacia", "haciendo", "hago", "han", "has", "hasta", "hay",
    "haya", "hayais", "hayamos", "hayan", "hayas", "he", "hecho", "hemos",
    "hicieron", "hizo", "horas", "hoy", "hube", "hubiera", "hubierais", "hubieramos",
    "hubieran", "hubieras", "hubieron", "hubiese", "hubieseis", "hubiesemos", "hubiesen", "hubieses",
    "hubimos", "hubiste", "hubisteis", "hubo", "i", "igual", "incluso", "indico",
    "informo", "intenta", "intentais", "intentamos", "intentan", "intentar", "intentas", "intento",
    "ir", "j", "jamas", "junto", "juntos", "k", "l", "la",
    "lado", "largo", "las", "le", "lejos", "les", "llego", "lleva",
    "llevar", "lo", "los", "luego", "lugar", "m", "mal", "manera",
    "manifesto", "mas", "mayor", "me", "mediante", "medio", "mejor", "menciono",
    "menos", "menudo", "mi", "mia", "mias", "mientras", "mio", "mios",
    "mis", "misma", "mismas", "mismo", "mismos", "modo", "momento", "mucha",
    "muchas", "muchisima", "muchisimas", "muchisimo", "muchisimos", "mucho", "muchos", "muy",
    "n", "nada", "nadie", "ni", "ningun", "ninguna", "ningunas", "ninguno",
    "ningunos", "no", "nos", "nosotras", "nosotros", "nuestra", "nuestras", "nuestro",
    "nuestros", "nueva", "nuevas", "nuevo", "nuevos", "nunca", "o", "ocho",
    "os", "otra", "otras", "otro", "otros", "p", "pais", "para",
    "parece", "parecer", "parte", "partir", "pasada", "pasado", "peor", "pero",
    "pesar", "poca", "pocas", "poco", "pocos", "podeis", "podemos", "poder",
    "podra", "podran", "podria", "podriais", "podriamos", "podrian", "podrias", "poner",
    "por", "por que", "porque", "posible", "primer", "primera", "primeras", "primero",
    "primero desde", "primeros", "principalmente", "pronto", "propia", "propias", "propio", "propios",
    "proximo", "proximos", "pudo", "pueda", "puede", "pueden", "puedo", "pues",
    "q", "qeu", "que", "quedo", "queremos", "querer", "quien", "quienes",
    "quienesquiera", "quienquiera", "quiere", "quiza", "quizas", "r", "raras", "realizado",
    "realizar", "realizo", "repente", "respecto", "s", "sabe", "sabeis", "sabemos",
    "saben", "saber", "sabes", "sal", "salvo", "se", "sea", "seais",
    "seamos", "sean", "seas", "segun", "segunda", "segundo", "seis", "senalo",
    "ser", "sera", "seran", "seras", "sere", "sereis", "seremos", "seria",
    "seriais", "seriamos", "serian", "serias", "si", "sido", "siempre", "siendo",
    "siete", "sigue", "siguiente", "sin", "sino", "so", "sobre", "sois",
    "sola", "solamente", "solas", "solo", "solos", "somos", "son", "soy",
    "soyos", "sr", "sra", "sres", "sta", "su", "supuesto", "sus",
    "suya", "suyas", "suyo", "suyos", "t", "tal", "tales", "tambien",
    "tampoco", "tan", "tanta", "tantas", "tanto", "tantos", "tarde", "te",
    "temprano", "tendra", "tendran", "tendras", "tendre", "tendreis", "tendremos", "tendria",
    "tendriais", "tendriamos", "tendrian", "tendrias", "tened", "teneis", "tenemos", "tener",
    "tenga", "tengais", "tengamos", "tengan", "tengas", "tengo", "tenia", "teniais",
    "teniamos", "tenian", "tenias", "tenida", "tenidas", "tenido", "tenidos", "teniendo",
    "tercera", "ti", "tiempo", "tiene", "tienen", "tienes", "toda", "todas",
    "todavia", "todo", "todos", "tomar", "total", "trabaja", "trabajais", "trabajamos",
    "trabajan", "trabajar", "trabajas", "trabajo", "tras", "trata", "traves", "tres",
    "tu", "tus", "tuve", "tuviera", "tuvierais", "tuvieramos", "tuvieran", "tuvieras",
    "tuvieron", "tuviese", "tuvieseis", "tuviesemos", "tuviesen", "tuvieses", "tuvimos", "tuviste",
    "tuvisteis", "tuvo", "tuya", "tuyas", "tuyo", "tuyos", "u", "ultima",
    "ultimas", "ultimo", "ultimos", "un", "una", "unas", "uno", "unos",
    "uns", "usa", "usais", "usamos", "usan", "usar", "usas", "uso",
    "usted", "ustedes", "v", "va", "vais", "valor", "vamos", "van",
    "varias", "varios", "vaya", "veces", "ver", "verdad", "verdadera", "verdadero",
    "vez", "vosotras", "vosotros", "voy", "vuestra", "vuestras", "vuestro", "vuestros",
    "w", "x", "y", "ya", "yo", "z", "tj", "tjbaja",
    "tijuas", "tjlife", "tjfood", "tijuana", "tjfoodie", "tijuanabc", "tijuanalife", "tijuanarulz",
    "tijuanaeats", "tijuanafood", "tijuanalove", "visittijuana", "yoamotijuana", "tijuanalocal", "tijuanastyle", "tijuanafoodie",
    "tijuanamexico", "whatiworeigers", "tijuanafoodlovers", "viajerasmexicanas", "tijuanamesorprende", "tijuanatesorprende", "dondecomerentijuana", "tijuanamakesmehappy",
    "tijuanamakesmehungry", "tijuanabajacalifornia", "pm", "58", "tel", "664", "más", "ven",
    "qué", "cuál", "baja", "está", "text", "image", "photo", "march",
    "abril", "april", "norte", "hecha", "súper", "shared", "puedes", "puedes",
    "quedes", "people", "méxico", "también", "favorita", "esperamos", "jeing0812",))

# the ES module's actual export: own entries ∪ EN (stopwords_es.js:716)
ES: frozenset[str] = ES_OWN | EN


def combined(langs: tuple[str, ...] = ("es",)) -> list[str]:
    """Union of stopword lists per the reference's semantics
    (lda/index.js:25-28 concatenates ``stopwords_{lang}.js`` exports):
    requesting 'es' yields ES ∪ EN (the spread at stopwords_es.js:716);
    'en' yields EN alone. Sorted for determinism."""
    out: set[str] = set()
    for lang in langs:
        if lang == "es":
            out |= ES
        elif lang == "en":
            out |= EN
        else:
            raise KeyError(f"no stopword list for {lang!r}")
    return sorted(out)
