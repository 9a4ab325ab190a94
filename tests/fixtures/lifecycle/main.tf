resource "aws_db_instance" "prod_db" {
  engine = "postgres"
  lifecycle {
    prevent_destroy = true
  }
}

resource "aws_instance" "web" {
  instance_type = "t3.micro"
  lifecycle {
    create_before_destroy = true
  }
}

resource "aws_autoscaling_group" "asg" {
  max_size = 10
  lifecycle {
    ignore_changes = [desired_capacity, tags]
  }
}

resource "aws_s3_bucket" "legacy" {
  bucket = "old-data"
  lifecycle {
    ignore_changes = all
  }
}

resource "aws_elasticache_cluster" "cache" {
  node_type = "cache.t3.micro"
  lifecycle {
    prevent_destroy = false
  }
}

resource "aws_sqs_queue" "plain" {
  name = "jobs"
}

resource "aws_db_instance" "replica" {
  engine = "postgres"
  lifecycle {
    prevent_destroy       = true
    create_before_destroy = true
    ignore_changes        = [tags]
  }
}
