data "aws_route53_zone" "zone" {
  name = "example.com."
}

resource "aws_route53_record" "www" {
  zone_id = data.aws_route53_zone.zone.zone_id
  name    = "www"
}
