package graft.operators

import graft.engine.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL canonicalization + domain governance: the first filter a crawl
  * corpus passes through (dedup by canonical URL, domain blocklists,
  * per-domain quotas all key on this). The reference has no web-crawl
  * surface (it ingests uploads, data_ingestion.py:110), but any 100 TB
  * text pipeline starts here — and the operators downstream (exact
  * dedup, q_mixture's domain weights, q_pagerank's domain centrality)
  * all want the canonical form this produces.
  *
  * All pure string functions (no java.net.URL — its equals/resolve touch
  * the network), applied per-row in a typed mapPartitions: narrow, no
  * shuffle, linear — the PDF-extractor scale shape.
  */
object UrlOps {

  /** Vendored public-suffix rules in the list's own file format
    * (publicsuffix.org — public-domain data; one rule per line, `*.`
    * wildcard rules, `!` exception rules). This is a curated ~1,070-rule
    * SUBSET of the real ~9k-rule list (the container is zero-egress; the
    * remainder is a pure data drop in this exact format) — a deployment
    * swaps in the full vendored snapshot; the parser and matcher below
    * implement the complete algorithm, including the implicit `*`
    * default rule, so only this data seq changes. Multi-label ccTLD registries, the
    * canonical wildcard/exception family (`*.ck` / `!www.ck`, the
    * Japanese city wildcards), and the private-section hosting domains a
    * per-domain corpus quota most needs (github.io, blogspot.com, ...)
    * are all represented. */
  val PslRules: Seq[String] = Seq(
    // ICANN section — United Kingdom (incl. the *.sch.uk school wildcard)
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "*.sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    // Australia (incl. the state/territory second-levels)
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "act.au", "nsw.au", "nt.au", "qld.au", "sa.au", "tas.au", "vic.au",
    "wa.au",
    // Japan (+ the geographic wildcards with their city exceptions)
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
    "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
    "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
    "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
    "!city.yokohama.jp",
    // New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz",
    // Brazil — the registry's sectoral second-levels plus the *.nom.br
    // personal-name wildcard (surname.forename.nom.br registrations:
    // the multi-label-suffix family a crawl quota must group correctly)
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br",
    "adv.br", "agr.br", "arq.br", "bio.br", "cnt.br", "coop.br", "ecn.br",
    "eco.br", "emp.br", "eng.br", "esp.br", "eti.br", "far.br", "flog.br",
    "fm.br", "fnd.br", "fot.br", "g12.br", "imb.br", "ind.br", "inf.br",
    "jor.br", "jus.br", "leg.br", "mat.br", "med.br", "mil.br", "mp.br",
    "mus.br", "not.br", "ntr.br", "odo.br", "ppg.br", "pro.br", "psc.br",
    "psi.br", "qsl.br", "radio.br", "rec.br", "slg.br", "srv.br",
    "taxi.br", "teo.br", "tmp.br", "trd.br", "tur.br", "tv.br", "vet.br",
    "vlog.br", "wiki.br", "zlg.br", "*.nom.br",
    // India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "mil.in", "nic.in",
    // China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    // Korea
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "mil.kr",
    "ac.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr",
    // Mexico, South Africa, Singapore, Hong Kong, Taiwan
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    // Argentina, Turkey, Israel, Ukraine, Poland
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr",
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    // Thailand, Indonesia, Malaysia, Philippines, Vietnam
    "co.th", "or.th", "ac.th", "go.th", "in.th", "mi.th", "net.th",
    "co.id", "or.id", "ac.id", "go.id", "web.id", "sch.id", "net.id", "my.id",
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my", "name.my",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph", "mil.ph", "i.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    // Egypt, Nigeria, Kenya, Saudi Arabia, UAE
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg", "sci.eg", "eun.eg",
    "mil.eg", "name.eg",
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng", "i.ng", "mil.ng",
    "mobi.ng", "name.ng", "sch.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "mobi.ke", "info.ke",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa", "pub.sa",
    "sch.sa",
    "co.ae", "net.ae", "org.ae", "gov.ae", "ac.ae", "sch.ae", "mil.ae",
    // France, Spain, Greece, Portugal, Russia
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "int.pt", "publ.pt",
    "nome.pt",
    "ac.ru", "edu.ru", "gov.ru", "int.ru", "mil.ru",
    // Canada (federal + provincial second-levels)
    "gc.ca", "ab.ca", "bc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca",
    "ns.ca", "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca", "yk.ca",
    // United States (the locality namespace: every state/territory code
    // is a public suffix — city.state.us registrations)
    "ak.us", "al.us", "ar.us", "az.us", "ca.us", "co.us", "ct.us",
    "dc.us", "de.us", "fl.us", "ga.us", "gu.us", "hi.us", "ia.us",
    "id.us", "il.us", "in.us", "ks.us", "ky.us", "la.us", "ma.us",
    "md.us", "me.us", "mi.us", "mn.us", "mo.us", "ms.us", "mt.us",
    "nc.us", "nd.us", "ne.us", "nh.us", "nj.us", "nm.us", "nv.us",
    "ny.us", "oh.us", "ok.us", "or.us", "pa.us", "pr.us", "ri.us",
    "sc.us", "sd.us", "tn.us", "tx.us", "ut.us", "va.us", "vi.us",
    "vt.us", "wa.us", "wi.us", "wv.us", "wy.us",
    // Bulgaria (single-letter/digit second-levels: the registry's
    // historical 36-rule alphabet family)
    "0.bg", "1.bg", "2.bg", "3.bg", "4.bg", "5.bg", "6.bg", "7.bg",
    "8.bg", "9.bg", "a.bg", "b.bg", "c.bg", "d.bg", "e.bg", "f.bg",
    "g.bg", "h.bg", "i.bg", "j.bg", "k.bg", "l.bg", "m.bg", "n.bg",
    "o.bg", "p.bg", "q.bg", "r.bg", "s.bg", "t.bg", "u.bg", "v.bg",
    "w.bg", "x.bg", "y.bg", "z.bg",
    // Austria, Italy (regions), Romania, Hungary, Estonia, Latvia,
    // Lithuania, Iceland, Ireland, Cyprus, Malta, the Balkans
    "ac.at", "co.at", "gv.at", "or.at",
    "gov.it", "edu.it", "abruzzo.it", "basilicata.it", "calabria.it",
    "campania.it", "lazio.it", "liguria.it", "lombardia.it", "marche.it",
    "molise.it", "piemonte.it", "puglia.it", "sardegna.it", "sicilia.it",
    "toscana.it", "umbria.it", "veneto.it",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro", "rec.ro",
    "arts.ro", "firm.ro", "store.ro", "www.ro",
    "co.hu", "org.hu", "info.hu", "priv.hu", "sport.hu", "tm.hu",
    "news.hu", "2000.hu", "bolt.hu", "casino.hu", "city.hu", "erotica.hu",
    "film.hu", "forum.hu", "games.hu", "hotel.hu", "ingatlan.hu",
    "jogasz.hu", "konyvelo.hu", "lakas.hu", "media.hu", "sex.hu",
    "shop.hu", "suli.hu", "szex.hu", "tozsde.hu", "utazas.hu", "video.hu",
    "com.ee", "org.ee", "edu.ee", "gov.ee", "riik.ee", "lib.ee", "med.ee",
    "pri.ee", "fie.ee", "aip.ee",
    "com.lv", "edu.lv", "gov.lv", "org.lv", "mil.lv", "id.lv", "net.lv",
    "asn.lv", "conf.lv",
    "gov.lt",
    "net.is", "com.is", "edu.is", "gov.is", "org.is", "int.is",
    "gov.ie",
    "ac.cy", "com.cy", "gov.cy", "net.cy", "org.cy", "ltd.cy", "press.cy",
    "tm.cy", "biz.cy", "ekloges.cy", "name.cy", "parliament.cy", "pro.cy",
    "com.mt", "edu.mt", "net.mt", "org.mt",
    "ac.rs", "co.rs", "edu.rs", "gov.rs", "in.rs", "org.rs",
    "com.hr", "iz.hr", "from.hr", "name.hr",
    "com.ba", "edu.ba", "gov.ba", "mil.ba", "net.ba", "org.ba",
    "com.mk", "org.mk", "net.mk", "edu.mk", "gov.mk", "inf.mk", "name.mk",
    "com.al", "edu.al", "gov.al", "mil.al", "net.al", "org.al",
    "gov.by", "mil.by", "com.by", "of.by",
    "com.mo", "net.mo", "org.mo", "edu.mo", "gov.mo",
    // Norway (the registry's public categories; the full municipal
    // namespace is part of the production data drop)
    "mil.no", "stat.no", "dep.no", "kommune.no", "herad.no", "priv.no",
    "vgs.no", "fhs.no", "folkebibl.no", "fylkesbibl.no", "idrett.no",
    "museum.no",
    // France (the professional/regulated namespaces next to the generic
    // ones already above)
    "avocat.fr", "aeroport.fr", "cci.fr", "chambagri.fr", "greta.fr",
    "medecin.fr", "notaires.fr", "pharmacien.fr", "port.fr",
    "veterinaire.fr", "avoues.fr", "chirurgiens-dentistes.fr",
    "experts-comptables.fr", "geometre-expert.fr", "huissier-justice.fr",
    // Poland (city/regional namespaces next to the generic set)
    "info.pl", "biz.pl", "krakow.pl", "poznan.pl", "gda.pl", "lodz.pl",
    "wroc.pl", "warszawa.pl", "mil.pl", "nieruchomosci.pl", "pc.pl",
    "powiat.pl", "realestate.pl", "rel.pl", "shop.pl", "sklep.pl",
    "sos.pl", "szkola.pl", "targi.pl", "tm.pl", "tourism.pl", "travel.pl",
    "turystyka.pl",
    // Central Asia, Caucasus, Middle East
    "org.kz", "edu.kz", "net.kz", "gov.kz", "mil.kz", "com.kz",
    "co.uz", "com.uz",
    "com.ge", "edu.ge", "gov.ge", "org.ge", "mil.ge", "net.ge", "pvt.ge",
    "com.am", "net.am", "org.am",
    "com.az", "net.az", "int.az", "gov.az", "org.az", "edu.az", "info.az",
    "pp.az", "mil.az", "name.az", "pro.az", "biz.az",
    "ac.ir", "co.ir", "gov.ir", "id.ir", "net.ir", "org.ir", "sch.ir",
    "gov.iq", "edu.iq", "mil.iq", "com.iq", "org.iq", "net.iq",
    "com.jo", "org.jo", "net.jo", "edu.jo", "sch.jo", "gov.jo", "mil.jo",
    "name.jo",
    "com.kw", "edu.kw", "emb.kw", "gov.kw", "ind.kw", "net.kw", "org.kw",
    "com.lb", "edu.lb", "gov.lb", "net.lb", "org.lb",
    "com.om", "co.om", "edu.om", "gov.om", "med.om", "museum.om",
    "net.om", "org.om", "pro.om",
    "com.qa", "edu.qa", "gov.qa", "mil.qa", "name.qa", "net.qa", "org.qa",
    "sch.qa",
    "com.bh", "edu.bh", "net.bh", "org.bh", "gov.bh",
    "edu.sy", "gov.sy", "net.sy", "mil.sy", "com.sy", "org.sy",
    "edu.ps", "gov.ps", "sec.ps", "plo.ps", "com.ps", "org.ps", "net.ps",
    // South & Southeast Asia
    "com.pk", "net.pk", "edu.pk", "org.pk", "fam.pk", "biz.pk", "web.pk",
    "gov.pk", "gob.pk", "gok.pk", "gon.pk", "gop.pk", "gos.pk",
    "gov.lk", "sch.lk", "net.lk", "int.lk", "com.lk", "org.lk", "edu.lk",
    "ngo.lk", "soc.lk", "web.lk", "ltd.lk", "assn.lk", "grp.lk",
    "hotel.lk",
    "int.la", "net.la", "info.la", "edu.la", "gov.la", "per.la", "com.la",
    "org.la",
    "gov.mn", "edu.mn", "org.mn",
    "org.kg", "net.kg", "com.kg", "edu.kg", "gov.kg", "mil.kg",
    "ac.tj", "biz.tj", "co.tj", "com.tj", "edu.tj", "go.tj", "gov.tj",
    "int.tj", "mil.tj", "name.tj", "net.tj", "nic.tj", "org.tj",
    "test.tj", "web.tj",
    "com.tm", "co.tm", "org.tm", "net.tm", "nom.tm", "gov.tm", "mil.tm",
    "edu.tm",
    "com.bt", "edu.bt", "gov.bt", "net.bt", "org.bt",
    "com.bn", "edu.bn", "gov.bn", "net.bn", "org.bn",
    // Latin America beyond the set above
    "com.bo", "edu.bo", "gob.bo", "int.bo", "org.bo", "net.bo", "mil.bo",
    "tv.bo", "web.bo",
    "gob.cl", "gov.cl", "mil.cl",
    "arts.co", "com.co", "edu.co", "firm.co", "gov.co", "info.co",
    "int.co", "mil.co", "net.co", "nom.co", "org.co", "rec.co", "web.co",
    "ac.cr", "co.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
    "com.cu", "edu.cu", "org.cu", "net.cu", "gov.cu", "inf.cu",
    "art.do", "com.do", "edu.do", "gob.do", "gov.do", "mil.do", "net.do",
    "org.do", "sld.do", "web.do",
    "com.ec", "info.ec", "net.ec", "fin.ec", "k12.ec", "med.ec", "pro.ec",
    "org.ec", "edu.ec", "gov.ec", "gob.ec", "mil.ec",
    "com.gt", "edu.gt", "gob.gt", "ind.gt", "mil.gt", "net.gt", "org.gt",
    "com.hn", "edu.hn", "org.hn", "net.hn", "mil.hn", "gob.hn",
    "ac.ni", "biz.ni", "co.ni", "com.ni", "edu.ni", "gob.ni", "in.ni",
    "info.ni", "int.ni", "mil.ni", "net.ni", "nom.ni", "org.ni", "web.ni",
    "ac.pa", "gob.pa", "com.pa", "org.pa", "sld.pa", "edu.pa", "net.pa",
    "ing.pa", "abo.pa", "med.pa", "nom.pa",
    "edu.pe", "gob.pe", "nom.pe", "mil.pe", "org.pe", "com.pe", "net.pe",
    "com.py", "coop.py", "edu.py", "gov.py", "mil.py", "net.py", "org.py",
    "com.sv", "edu.sv", "gob.sv", "org.sv", "red.sv",
    "com.uy", "edu.uy", "gub.uy", "mil.uy", "net.uy", "org.uy",
    "co.ve", "com.ve", "edu.ve", "gob.ve", "gov.ve", "info.ve", "int.ve",
    "mil.ve", "net.ve", "org.ve", "web.ve", "arts.ve", "firm.ve",
    "rec.ve", "store.ve", "tec.ve",
    "int.ar", "mil.ar",
    // Africa beyond the set above
    "com.gh", "edu.gh", "gov.gh", "org.gh", "mil.gh",
    "co.tz", "ac.tz", "go.tz", "or.tz", "ne.tz", "sc.tz",
    "co.ug", "or.ug", "ac.ug", "sc.ug", "go.ug", "ne.ug", "com.ug",
    "org.ug",
    "ac.zm", "biz.zm", "co.zm", "com.zm", "edu.zm", "gov.zm", "info.zm",
    "mil.zm", "net.zm", "org.zm", "sch.zm",
    "co.zw", "ac.zw", "org.zw", "gov.zw", "mil.zw",
    "ac.mz", "adv.mz", "co.mz", "edu.mz", "gov.mz", "mil.mz", "net.mz",
    "org.mz",
    "ed.ao", "gv.ao", "og.ao", "co.ao", "pb.ao", "it.ao",
    "co.bw", "org.bw",
    "com.et", "gov.et", "org.et", "edu.et", "biz.et", "name.et",
    "info.et", "net.et",
    "com.dz", "org.dz", "net.dz", "gov.dz", "edu.dz", "asso.dz",
    "pol.dz", "art.dz",
    "co.ma", "net.ma", "gov.ma", "org.ma", "ac.ma", "press.ma",
    "com.tn", "ens.tn", "fin.tn", "gov.tn", "ind.tn", "intl.tn",
    "nat.tn", "net.tn", "org.tn", "info.tn", "perso.tn", "tourism.tn",
    "com.ly", "net.ly", "gov.ly", "plc.ly", "edu.ly", "sch.ly", "med.ly",
    "org.ly", "id.ly",
    "com.sd", "net.sd", "org.sd", "edu.sd", "med.sd", "tv.sd", "gov.sd",
    "info.sd",
    "test.ru",
    // entire-TLD wildcards (registries that delegate only at the third
    // level), incl. the canonical Cook Islands wildcard+exception pair
    "*.bd", "*.er", "*.fk", "*.jm", "*.kh", "*.mm", "*.np", "*.pg",
    "*.ye", "*.ck", "!www.ck",
    // ---- private section (hosting platforms: each customer site is its
    // own "registrable domain" for crawl quotas and dedup keying)
    "github.io", "githubusercontent.com", "gitlab.io", "blogspot.com",
    "herokuapp.com", "appspot.com", "azurewebsites.net", "netlify.app",
    "vercel.app", "pages.dev", "workers.dev", "web.app", "firebaseapp.com",
    "fly.dev", "onrender.com", "glitch.me", "neocities.org",
    "readthedocs.io", "bitbucket.io", "cloudfunctions.net",
    "s3.amazonaws.com", "cloudfront.net", "wordpress.com", "surge.sh")

  // rule index, built once at class load: exact rules, wildcard bases
  // ('*.ck' -> 'ck'), exception targets ('!www.ck' -> 'www.ck')
  private val pslException: Set[String] =
    PslRules.filter(_.startsWith("!")).map(_.substring(1)).toSet
  private val pslWildcardBase: Set[String] =
    PslRules.filter(_.startsWith("*.")).map(_.substring(2)).toSet
  private val pslExact: Set[String] =
    PslRules.filterNot(r => r.startsWith("!") || r.startsWith("*.")).toSet

  /** Tracking parameters stripped during canonicalization. */
  val TrackingParams: Set[String] = Set("fbclid", "gclid", "msclkid", "igshid", "mc_eid")
  def isTrackingParam(name: String): Boolean =
    name.startsWith("utm_") || TrackingParams.contains(name)

  /** Domains a curation pass refuses outright. */
  val Blocklist: Set[String] = Set("spam-site.co.uk", "malware.example")

  final case class ParsedUrl(scheme: String, host: String, port: Int,
      path: String, query: String, fragment: String)

  /** Hand parse of scheme://host[:port][/path][?query][#fragment].
    * Returns None on anything that doesn't fit (no scheme, empty host) —
    * a crawl pipeline routes those to a reject table, never throws. */
  def parseUrl(url: String): Option[ParsedUrl] = {
    if (url == null) return None
    val ss = url.indexOf("://")
    if (ss <= 0) return None
    val scheme = url.substring(0, ss)
    if (!scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.')) return None
    val rest = url.substring(ss + 3)
    val hashAt = rest.indexOf('#')
    val (beforeFrag, frag) =
      if (hashAt < 0) (rest, "") else (rest.substring(0, hashAt), rest.substring(hashAt + 1))
    val qAt = beforeFrag.indexOf('?')
    val (hostPath, query) =
      if (qAt < 0) (beforeFrag, "") else (beforeFrag.substring(0, qAt), beforeFrag.substring(qAt + 1))
    val slashAt = hostPath.indexOf('/')
    val (authority0, path) =
      if (slashAt < 0) (hostPath, "") else (hostPath.substring(0, slashAt), hostPath.substring(slashAt))
    // userinfo ('user:pass@host') strips at the LAST '@' of the
    // authority — RFC 3986 §3.2.1: '@' cannot appear in a host, so
    // everything before it is userinfo (its ':' must not be mistaken
    // for the port separator)
    val atAt = authority0.lastIndexOf('@')
    val hostPort = if (atAt < 0) authority0 else authority0.substring(atAt + 1)
    val (host, port) =
      if (hostPort.startsWith("[")) {
        // IPv6 literal ('[::1]:8080'): colons inside the brackets are the
        // address; the port separator is only the ':' after ']'
        val close = hostPort.indexOf(']')
        if (close < 0) return None // unterminated bracket: reject-table row
        val h = hostPort.substring(0, close + 1)
        val after = hostPort.substring(close + 1)
        if (after.isEmpty) (h, -1)
        else if (after.startsWith(":")) {
          val p = after.substring(1)
          if (p.nonEmpty && p.forall(_.isDigit) && p.length <= 5) (h, p.toInt)
          else return None
        } else return None
      } else {
        val colonAt = hostPort.lastIndexOf(':')
        if (colonAt < 0) (hostPort, -1)
        else {
          val p = hostPort.substring(colonAt + 1)
          if (p.nonEmpty && p.forall(_.isDigit) && p.length <= 5)
            (hostPort.substring(0, colonAt), p.toInt)
          else (hostPort, -1)
        }
      }
    if (host.isEmpty) None
    else Some(ParsedUrl(scheme, host, port, path, query, frag))
  }

  /** RFC 3986 §5.2.4 dot-segment removal, plus empty-segment collapse
    * (`//` → `/`) — the extra step crawl canonicalizers add so the same
    * page doesn't survive under both spellings. Always returns a path
    * starting with '/'; '..' past the root is dropped (browser behavior). */
  def normalizePath(path: String): String = {
    val stack = scala.collection.mutable.ArrayBuffer.empty[String]
    path.split("/", -1).foreach {
      case "" | "." => // collapse
      case ".."     => if (stack.nonEmpty) stack.remove(stack.length - 1)
      case seg      => stack += seg
    }
    "/" + stack.mkString("/")
  }

  /** Strip tracking parameters, preserving the order of the rest.
    * Percent-escapes are NOT decoded (decoding can change which page the
    * URL names; canonical form keeps them verbatim). */
  def normalizeQuery(query: String): String =
    if (query.isEmpty) ""
    else query.split("&", -1).filter { p =>
      val name = p.indexOf('=') match { case -1 => p; case eq => p.substring(0, eq) }
      p.nonEmpty && !isTrackingParam(name.toLowerCase(java.util.Locale.ROOT))
    }.mkString("&")

  private val DefaultPorts = Map("http" -> 80, "https" -> 443, "ftp" -> 21)

  /** Canonical form: lowercase scheme+host, default port dropped,
    * dot-segments resolved, '//' collapsed, trailing slash dropped
    * (except root), tracking params stripped, fragment dropped. */
  def normalizeUrl(url: String): Option[String] =
    parseUrl(url).map { u =>
      val scheme = u.scheme.toLowerCase(java.util.Locale.ROOT)
      val host = u.host.toLowerCase(java.util.Locale.ROOT)
      val port =
        if (u.port < 0 || DefaultPorts.get(scheme).contains(u.port)) ""
        else ":" + u.port
      val path0 = normalizePath(u.path)
      val path = if (path0.length > 1) path0 else "/"
      val query = normalizeQuery(u.query)
      val q = if (query.isEmpty) "" else "?" + query
      val p = if (path == "/" && q.isEmpty) "/" else path
      s"$scheme://$host$port$p$q"
    }

  /** Public-suffix length in labels for a lowercased label array — the
    * full publicsuffix.org algorithm: every matching rule is considered,
    * an exception rule beats all others (its suffix is the rule minus the
    * leading label), otherwise the LONGEST match wins, and the implicit
    * `*` default rule makes any unknown TLD a 1-label suffix. */
  private def publicSuffixLen(labels: Array[String]): Int = {
    var best = 1 // implicit default rule '*'
    var exception = -1
    var i = 0
    while (i < labels.length) {
      val cand = labels.drop(i).mkString(".")
      if (pslException.contains(cand))
        exception = math.max(exception, labels.length - i - 1)
      if (pslExact.contains(cand))
        best = math.max(best, labels.length - i)
      // wildcard '*.<base>' matches any candidate of >= 2 labels whose
      // tail after the first label is <base>
      if (labels.length - i >= 2 &&
          pslWildcardBase.contains(labels.drop(i + 1).mkString(".")))
        best = math.max(best, labels.length - i)
      i += 1
    }
    if (exception >= 0) exception else best
  }

  /** Registrable domain per the public-suffix list: the public suffix
    * plus one label. A host that IS a public suffix (or shorter) returns
    * itself; IP-literal hosts (bracketed IPv6, all-numeric IPv4) have no
    * registrable domain and return themselves — the PSL algorithm is
    * defined over DNS names only. */
  def registrableDomain(host: String): String = {
    val lower = host.toLowerCase(java.util.Locale.ROOT)
    if (lower.startsWith("[")) return lower
    val labels = lower.split("\\.", -1).filter(_.nonEmpty)
    if (labels.nonEmpty && labels.forall(_.forall(_.isDigit)))
      return labels.mkString(".")
    val psLen = publicSuffixLen(labels)
    if (labels.length <= psLen) labels.mkString(".")
    else labels.takeRight(psLen + 1).mkString(".")
  }

  /** RFC 3986 §5.2 reference resolution (the crawl-frontier primitive:
    * every href on a page is a reference against that page's URL):
    * absolute refs pass through; `//authority` adopts the base scheme;
    * `/rooted` paths replace the base path; `?query` keeps the base
    * path; everything else merges onto the base path's directory. The
    * resolved URL then canonicalizes through [[normalizeUrl]]. None on
    * an unparseable base. */
  def resolveRef(base: String, ref: String): Option[String] = {
    if (ref == null) return None
    val r = ref.trim
    if (r.matches("^[A-Za-z][A-Za-z0-9+.-]*://.*")) return normalizeUrl(r)
    // non-hierarchical absolute refs (mailto:, javascript:, data:, tel:,
    // …) — a scheme NOT followed by `//`. RFC 3986 §4.2 forbids a colon
    // in a relative ref's first segment precisely so these are
    // unambiguous; merging one onto the base dir would mint bogus
    // frontier URLs like http://host/pages/mailto:user@x.com.
    if (r.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*")) return None
    // same-document reference (§5.2: a fragment-only ref resolves to the
    // base itself) — the ubiquitous href="#..." pattern must not emit
    // the base DIRECTORY into the frontier
    if (r.startsWith("#")) return normalizeUrl(base)
    parseUrl(base).flatMap { b =>
      val scheme = b.scheme.toLowerCase(java.util.Locale.ROOT)
      val port = if (b.port < 0) "" else ":" + b.port
      val authority = b.host + port
      val resolved =
        if (r.startsWith("//")) s"$scheme:$r"
        else if (r.startsWith("/")) s"$scheme://$authority$r"
        else if (r.startsWith("?")) {
          val p = if (b.path.isEmpty) "/" else b.path
          s"$scheme://$authority$p$r"
        } else if (r.isEmpty) base
        else {
          // merge: replace everything after the base path's last '/'
          val p = if (b.path.isEmpty) "/" else b.path
          val dir = p.substring(0, p.lastIndexOf('/') + 1)
          s"$scheme://$authority$dir$r"
        }
      normalizeUrl(resolved) // dot segments resolve in canonicalization
    }
  }

  /** Deterministic raw-URL generator for the gate: five families that
    * jointly exercise every canonicalization rule (case-mixed host +
    * default port + dot-segments + utm + fragment; '//' collapse +
    * trailing slash; multi-part suffix + blocklist hit; './' + kept
    * percent-escape; already-canonical). */
  def rawUrl(id: Long): String = (id % 5) match {
    case 0 => s"HTTP://WWW.Example.COM:80/a/b/../c/page$id?utm_source=feed&q=$id#sec2"
    case 1 => s"https://Blog.Example.org:443/posts//$id/?id=$id&utm_campaign=x"
    case 2 => s"http://Ads.Spam-Site.co.uk/offer?fbclid=abc$id"
    case 3 => s"https://docs.example.com/kb/./$id?q=a%20b&gclid=1"
    case _ => s"http://example.com/item/$id"
  }

  /** Oracle-checked canonicalize + domain + blocklist pass over one
    * generated URL per document. The oracle states each family's
    * canonical form in CLOSED FORM (it never runs the parser), so
    * builder and checker share no code — any rule defect hash-mismatches. */
  /** The canonicalize pass over any frame with a `doc_id` column — one
    * narrow typed map, no shuffle. */
  def urlVerdicts(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val raw = rawUrl(id)
          val norm = normalizeUrl(raw).getOrElse("")
          val host = parseUrl(raw).map(_.host.toLowerCase(java.util.Locale.ROOT)).getOrElse("")
          val domain = registrableDomain(host)
          (id, norm, domain, Blocklist.contains(domain))
        }
      }
      .toDF("doc_id", "url_norm", "domain", "blocked")
  }

  def qUrlFilter(s: SparkSession, d: String): DataFrame =
    urlVerdicts(Tables.rebalance(Tables.documents(s, d), "doc_id"))
      .orderBy("doc_id")
}
